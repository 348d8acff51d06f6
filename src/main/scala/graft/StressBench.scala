package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress harness for the dedup family (VERDICT r3 item 8): the
  * driver ships no sf1 fixtures, so this builds a 10× corpus DERIVED
  * from sf0.1 and measures the LSH scale paths at N and 10N docs. The
  * quadratic oracle twins are excluded by design — they exist for
  * correctness at small SF, not for scale.
  *
  * Replication must not manufacture quadratic near-dup structure:
  * replica i prefixes every token with `r$i` (cross-replica Jaccard = 0)
  * and sign-flips embedding dimensions with a replica-specific ±1
  * pattern (cross-replica cosine ≈ 0, within-replica cosines exactly
  * preserved — signs square away). So the TRUE pair count scales ×10,
  * and a sub-quadratic engine should show runtime ratios near the data
  * ratio, far under the ×100 an all-pairs plan would pay.
  *
  * Output: one JSON line
  * `{"stress":"dedup10x","base":{...},"x10":{...},"queries":{name:
  *   {"base_sec":s,"x10_sec":s,"ratio":r,"base_rows":n,"x10_rows":n}}}`.
  */
object StressBench {

  private def replicate(spark: SparkSession, baseDir: String, outDir: String,
                        copies: Int): Unit = {
    val docs = spark.read.parquet(s"$baseDir/documents.parquet")
    val emb = spark.read.parquet(s"$baseDir/embeddings.parquet")
    val nDocs = docs.agg(max(col("doc_id"))).head.getLong(0) + 1
    val nVecs = emb.agg(max(col("vec_id"))).head.getLong(0) + 1
    val docReps = (0 until copies).map { i =>
      val prefixed =
        if (i == 0) col("text")
        else expr(s"array_join(transform(split(text, ' '), t -> concat('r$i', t)), ' ')")
      docs.select((col("doc_id") + lit(i * nDocs)).as("doc_id"),
        prefixed.as("text"),
        col("source"), col("lang"), col("n_chars"))
    }
    docReps.reduce(_ unionByName _)
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/documents.parquet")
    val embReps = (0 until copies).map { i =>
      val flipped =
        if (i == 0) col("embedding")
        else expr(s"""transform(embedding, (v, j) ->
                     |  CAST(v * (CAST(pmod(xxhash64(j * 131 + $i), 2) AS DOUBLE) * 2.0 - 1.0) AS FLOAT))"""
          .stripMargin)
      emb.select((col("vec_id") + lit(i * nVecs)).as("vec_id"), flipped.as("embedding"))
    }
    embReps.reduce(_ unionByName _)
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = if (args.length > 1) args(1) else "/tmp/graft-stress"
    val copies = 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(e => new graft.functions.GraftExtensions()(e))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // both corpora rebuilt through the same writer so file layout and
    // compression are comparable; base = 1 copy of sf0.1
    val baseOut = s"$work/base"
    val bigOut = s"$work/x10"
    replicate(spark, baseDir, baseOut, 1)
    replicate(spark, baseDir, bigOut, copies)

    val queries = Seq("x2_minhash_lsh", "x2_incremental", "x2_dup_clusters",
      "x2_embedding_lsh")
    def timeOne(name: String, dir: String): (Double, Long) = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, dir).count()
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    val stats = queries.map { name =>
      val (bs, br) = timeOne(name, baseOut)
      val (xs, xr) = timeOne(name, bigOut)
      name -> (bs, xs, br, xr)
    }

    // the VERDICT-1 claim measured directly: admit the 10x corpus as 10
    // sequential micro-batches against a growing band store — per-batch
    // wall time must stay FLAT (probe cost is bucket-bounded, never
    // O(store)); before the bucketed store each batch rescanned and
    // re-banded the full signature history, so batch 10 cost ~10x batch 1
    val admStore = s"$work/admstore"
    val admOut = s"$work/admout"
    val allDocs = spark.read.parquet(s"$bigOut/documents.parquet").persist()
    val perBatch = allDocs.count() / 10
    val admSecs = (0 until 10).map { b =>
      val batch = allDocs.filter(col("doc_id") >= b * perBatch && col("doc_id") < (b + 1) * perBatch)
      val t0 = System.nanoTime()
      graft.streaming.BandStore.admitBatch(batch, b.toLong, admStore, admOut)
      (System.nanoTime() - t0) / 1e9
    }
    allDocs.unpersist()
    def cnt(dir: String, t: String) = spark.read.parquet(s"$dir/$t.parquet").count()
    val qs = stats.map { case (n, (bs, xs, br, xr)) =>
      f""""$n":{"base_sec":$bs%.3f,"x10_sec":$xs%.3f,"ratio":${xs / bs}%.2f,"base_rows":$br,"x10_rows":$xr}"""
    }.mkString("{", ",", "}")
    val admJson = admSecs.map(s => f"$s%.3f").mkString("[", ",", "]")
    println(s"""{"stress":"dedup10x","copies":$copies,""" +
      s""""base_docs":${cnt(baseOut, "documents")},"x10_docs":${cnt(bigOut, "documents")},""" +
      s""""base_vecs":${cnt(baseOut, "embeddings")},"x10_vecs":${cnt(bigOut, "embeddings")},""" +
      s""""admission_batch_secs":$admJson,""" +
      s""""admitted":${spark.read.parquet(admOut).count()},""" +
      s""""queries":$qs}""")
    spark.stop()
  }
}
