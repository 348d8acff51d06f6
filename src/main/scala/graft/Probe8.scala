package graft

import org.apache.spark.sql.SparkSession

/** Bench-adjudication probe: time named [[SparkEntry]] queries on a
  * given corpus dir in a fresh JVM with the suite-identical session
  * conf. The box this project benches on shows 2–7× contention swings
  * (both driver BENCH_r07 and two round-8 stress runs recorded
  * phantom 10×+ "regressions" that vanished idle), so every suspect
  * bench row gets re-measured here — lone JVM, explicit query order
  * (first query carries JIT/codegen warmup; pass a warm-up name ahead
  * of the one under test) — before it is believed.
  *
  * Usage: `runMain graft.Probe8 <corpusDir> <queryName>...`
  */
object Probe8 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(e => new graft.functions.GraftExtensions()(e))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $name $sec%.3f s rows=$rows")
    }
    spark.stop()
  }
}
