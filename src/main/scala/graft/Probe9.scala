package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-9 timing probe: where does x2_labels_incremental spend its
  * seconds at sf0.1? (buildDocs on 6/7 vs the incremental append vs the
  * final read.) Throwaway diagnostics, not part of the driver contract.
  */
object Probe9 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(e => new graft.functions.GraftExtensions()(e))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe9] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    // warm
    graft.engine.Tables.documents(spark, sfDir).count()
    if (args.contains("cluster11m")) {
      // the STRESS cluster11m row in isolation: same synthetic graph
      val chainPairs10m = spark.range(0L, 10160128L)
        .filter(col("id") % 64 =!= 63)
        .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
      val cliqueBase = 100000000L
      val cliquePairs = spark.range(0L, 2000L).select(col("id").as("c"))
        .crossJoin(spark.range(0L, 32L).select(col("id").as("i")))
        .crossJoin(spark.range(0L, 32L).select(col("id").as("j")))
        .filter(col("i") < col("j"))
        .select((lit(cliqueBase) + col("c") * 32 + col("i")).as("doc_a"),
          (lit(cliqueBase) + col("c") * 32 + col("j")).as("doc_b"))
      val bigPairs = chainPairs10m.unionByName(cliquePairs)
      t("cluster11m isolated") {
        val (labels, rounds) = graft.operators.Dedup.clusterPairs(bigPairs)
        println(s"[probe9] clusters=${labels.select(col("cluster_rep")).distinct().count()} rounds=$rounds")
      }
      spark.stop(); return
    }
    for (pass <- 1 to 2) {
      println(s"[probe9] --- pass $pass ---")
      val store = java.nio.file.Files
        .createTempDirectory("probe9-label").toString + "/store"
      val subset = graft.engine.Tables.documents(spark, sfDir)
        .filter(col("doc_id") % 7 =!= 0)
      t("buildDocs(6/7)") {
        graft.operators.LabelStore.buildDocs(subset, store)
      }
      t("ensureCurrentIncremental") {
        graft.operators.LabelStore.ensureCurrentIncremental(spark, sfDir, store)
      }
      t("read+count") {
        graft.operators.LabelStore.read(spark, store).count()
      }
      // inner split of the build: pipeline vs index write
      val corpus = subset.persist()
      corpus.count()
      t("  clusters pipeline only") {
        graft.operators.Dedup.x2DupClustersOf(corpus).count()
      }
      t("  labels write only") {
        graft.operators.Dedup.x2DupClustersOf(corpus)
          .write.mode("overwrite")
          .parquet(java.nio.file.Files.createTempDirectory("probe9-lw").toString + "/labels")
      }
      val sig = corpus.filter(size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"), graft.operators.Dedup.shingles(col("text")).as("sh"))
        .withColumn("sig", graft.operators.Dedup.minhashSig)
      t("  signing (materialized)") {
        sig.write.mode("overwrite").format("noop").save()
      }
      val w = java.nio.file.Files.createTempDirectory("probe9-iw").toString
      t("  sigs write (16 buckets)") {
        sig.select(col("doc_id"), col("sh"))
          .withColumn("__db", pmod(col("doc_id"), lit(16)).cast("int"))
          .repartition(col("__db"))
          .write.mode("overwrite").partitionBy("__db").parquet(s"$w/sigs")
      }
      t("  bands write (64 buckets)") {
        sig.select(col("doc_id"), posexplode(expr(graft.operators.Dedup.bandSql)).as(Seq("band", "bh")))
          .select(col("band"), col("bh"), col("doc_id"))
          .withColumn("__bb", pmod(col("bh"), lit(64)).cast("int"))
          .repartition(col("__bb"))
          .write.mode("overwrite").partitionBy("__bb").parquet(s"$w/bands")
      }
      t("  digests write") {
        corpus.select(col("doc_id"), xxhash64(col("doc_id"), col("text")).as("h"))
          .write.mode("overwrite").parquet(s"$w/digests")
      }
      corpus.unpersist()
    }
    spark.stop()
  }
}
