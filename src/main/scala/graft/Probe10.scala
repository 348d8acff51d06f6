package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Round-10 dev harness: the LabelStore stage-timer modes. The generic
  * "dump a named query subset" branch this file carried moved into
  * [[Verify]] itself (args 3+ select the subset), which removed a
  * verbatim copy of its JSON escaper — use
  * `runMain graft.Verify <sfDir> <outDir> <name> [<name>…]` for that.
  * Usage here: runMain graft.Probe10 <sfDir> labelbuild|labelappend
  */
object Probe10 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mode = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(e => new graft.functions.GraftExtensions()(e))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    mode match {
      case "labelbuild" => labelBuildSplit(spark, sfDir)
      case "labelappend" => labelAppendSplit(spark, sfDir)
      case other => sys.error(s"Probe10: unknown mode '$other' " +
        "(query-subset dumps moved to graft.Verify)")
    }
    spark.stop()
  }

  /** The append path under the LabelStore stage timers: fresh split
    * build, then the timed incremental merge — the task-3 feedback loop.
    */
  private def labelAppendSplit(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.LabelStore
    for (pass <- 1 to 4) {
      println(s"[probe10] --- pass $pass ---")
      val store = java.nio.file.Files.createTempDirectory("probe10-la").toString + "/store"
      val t0 = System.nanoTime()
      LabelStore.buildDocs(
        graft.engine.Tables.documents(spark, sfDir).filter(col("doc_id") % 7 =!= 0), store)
      println(f"[probe10] buildDocs(6/7)  ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.conf.set("spark.graft.debug.timing", "true")
      val t1 = System.nanoTime()
      LabelStore.ensureCurrentIncremental(spark, sfDir, store)
      println(f"[probe10] append total    ${(System.nanoTime() - t1) / 1e9}%.2f s")
      spark.conf.set("spark.graft.debug.timing", "false")
    }
  }

  /** buildDocs replicated stage-by-stage with timers — Probe9's inner
    * splits each re-sign from scratch, hiding the true stage split.
    */
  private def labelBuildSplit(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, LabelStore}
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe10] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    for (pass <- 1 to 2) {
      println(s"[probe10] --- pass $pass ---")
      val w = java.nio.file.Files.createTempDirectory("probe10-lb").toString
      val corpus = graft.engine.Tables.documents(spark, sfDir)
        .filter(col("doc_id") % 7 =!= 0).persist()
      val sig = corpus.filter(size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
        .withColumn("sig", Dedup.minhashSig).persist()
      val dg = corpus.select(col("doc_id"), xxhash64(col("doc_id"), col("text")).as("h"))
      t("fingerprint") { dg.agg(count(lit(1)), expr("bit_xor(h)")).head }
      t("sig materialize") { sig.write.mode("overwrite").format("noop").save() }
      t("clusters+labels write") {
        Dedup.x2DupClustersOf(corpus, preSigned = Some(sig))
          .write.mode("overwrite").parquet(s"$w/labels")
      }
      t("sigs write") {
        sig.select(col("doc_id"), col("sh"))
          .withColumn("__db", pmod(col("doc_id"), lit(16)).cast("int"))
          .repartition(col("__db"))
          .write.mode("overwrite").partitionBy("__db").parquet(s"$w/sigs")
      }
      t("bands write") {
        sig.select(col("doc_id"), posexplode(expr(Dedup.bandSql)).as(Seq("band", "bh")))
          .select(col("band"), col("bh"), col("doc_id"))
          .withColumn("__bb", pmod(col("bh"), lit(64)).cast("int"))
          .repartition(col("__bb"))
          .write.mode("overwrite").partitionBy("__bb").parquet(s"$w/bands")
      }
      t("digests write") { dg.write.mode("overwrite").parquet(s"$w/digests") }
      t("buildDocs (real, fresh store)") {
        LabelStore.buildDocs(corpus, s"$w/store")
      }
      sig.unpersist(); corpus.unpersist()
    }
  }
}
