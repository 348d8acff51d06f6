package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 dev harness: the BandStore admission stage timers (VERDICT
  * r10 item 4 — steady-state batch cost 8.2–9.4 s at the 50k stress
  * scale; the target is ≤5 s with the flat-growth property kept).
  * Replicates the StressBench dedup10x admission drive — sf0.1
  * documents ×10 admitted as 10 sequential batches — with
  * `spark.graft.debug.timing` on for the final batches so the stage
  * split of the steady state is visible.
  *
  * Usage: runMain graft.Probe11 <sfDir> admit
  */
object Probe11 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(e => new graft.functions.GraftExtensions()(e))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("probe11").toString
    // ×10 corpus with disjoint ids, the StressBench replicate discipline
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val maxId = docs0.agg(max(col("doc_id"))).head.getLong(0) + 1
    val big = s"$work/documents.parquet"
    (0 until 10)
      .map(i => docs0.withColumn("doc_id", col("doc_id") + lit(i * maxId)))
      .reduce(_ unionByName _)
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(big)

    val store = s"$work/admstore"
    val out = s"$work/admout"
    val all = spark.read.parquet(big).persist()
    val per = all.count() / 10
    val secs = (0 until 10).map { b =>
      if (b >= 7) spark.conf.set("spark.graft.debug.timing", "true")
      val batch = all.filter(col("doc_id") >= b * per && col("doc_id") < (b + 1) * per)
      val t0 = System.nanoTime()
      graft.streaming.BandStore.admitBatch(batch, b.toLong, store, out)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe11] batch $b total $s%6.2f s")
      s
    }
    println(f"[probe11] steady state (batches 7-9): ${secs.drop(7).sum / 3}%.2f s")
    all.unpersist()
    spark.stop()
  }
}
