package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** [EXT] Deterministic sampling for training-data assembly (X6).
  *
  * Random sampling is useless under a correctness gate (and unreproducible
  * across reruns of a 100 TB job); the production discipline is
  * HASH-derived pseudo-randomness — every engine, every rerun, every
  * engine version draws the same sample.
  */
object Sampling {

  /** X6a — stratified fixed-k sample: exactly k rows per stratum
    * (event_type), chosen by md5-rank of the row id — a portable
    * deterministic shuffle both engines compute identically.
    *
    * Scale shape: the per-stratum rank runs through the native
    * [[graft.plans.TopKPerGroup]] bounded-heap operator — each input
    * partition keeps at most k rows per stratum, the shuffle moves only
    * those survivors, and nothing ever sorts more than k rows (the
    * window form would shuffle the whole table into one task per
    * stratum and sort it).
    */
  def x6StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val k = 20
    graft.plans.TopKPerGroup.topKRanked(
        Tables.events(s, dir).select(col("event_id"), col("event_type"), col("user_id")),
        Seq(col("event_type")),
        Seq(md5(col("event_id").cast("string")), col("event_id")), k, "rk")
      .select(col("event_type"), col("rk"), col("event_id"), col("user_id"))
      .orderBy("event_type", "rk")
  }

  val x6StratifiedSampleSql: String =
    """SELECT event_type, rk, event_id, user_id FROM (
      |  SELECT event_type, event_id, user_id,
      |    CAST(row_number() OVER (PARTITION BY event_type
      |      ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS INTEGER) AS rk
      |  FROM events) WHERE rk <= 20 ORDER BY event_type, rk""".stripMargin

  /** THE 96/2/2 train/validation/test bucket mapping — shared with
    * [[graft.operators.Dags.dagTrainingPrep]] so a ratio change can
    * never leave the composite on the old split.
    */
  private[graft] def splitOf(bucket: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(bucket < 96, "train")
      .when(bucket < 98, "validation")
      .otherwise("test")

  /** X6b — deterministic hash-split into train/validation/test
    * (96/2/2 by md5 bucket of the doc id): the reproducible-split
    * discipline every training pipeline needs — a pure narrow map, no
    * shuffle, stable under reruns and engine changes. Returns the split
    * summary (assignment itself is the `split` column).
    */
  def x6HashSplit(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("bucket",
        conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10).cast("long") % 100)
      .withColumn("split", Sampling.splitOf(col("bucket")))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
      .orderBy("split")

  val x6HashSplitSql: String =
    """SELECT split, count(*) AS n_docs, min(doc_id) AS min_doc FROM (
      |  SELECT doc_id,
      |    CASE WHEN bucket < 96 THEN 'train'
      |         WHEN bucket < 98 THEN 'validation'
      |         ELSE 'test' END AS split
      |  FROM (SELECT doc_id,
      |          CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 AS bucket
      |        FROM documents))
      |GROUP BY split ORDER BY split""".stripMargin

  /** X6c — sequence packing: assign documents to fixed token-budget
    * context windows (GPT-style concat-and-cut: documents are laid out in
    * a deterministic order and the stream is cut every `budget` tokens, so
    * a bin may overflow by the one document straddling its boundary).
    *
    * Scale shape: packing is a running sum, which is inherently sequential
    * — so it runs PER SHARD, not globally: the window partitions by
    * (lang, source) and each shard packs independently in parallel. Shard
    * count grows with the data (at 100 TB the shard key would include a
    * date/bucket component), so no single partition ever holds the corpus.
    * The order within a shard is the md5 of the doc id — the same portable
    * deterministic shuffle as [[x6HashSplit]], identical in any engine.
    */
  def x6PackSequences(s: SparkSession, dir: String): DataFrame = {
    val budget = 256
    val w = Window.partitionBy(col("lang"), col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, dir)
      .select(col("lang"), col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("pre", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin_id", floor(col("pre") / budget.toDouble).cast("long"))
      .groupBy(col("lang"), col("source"), col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))
      .orderBy("lang", "source", "bin_id")
  }

  val x6PackSequencesSql: String =
    """WITH t AS (
      |  SELECT lang, source, doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    md5(CAST(doc_id AS VARCHAR)) AS r
      |  FROM documents),
      |c AS (
      |  SELECT lang, source, n_tokens,
      |    COALESCE(SUM(n_tokens) OVER (PARTITION BY lang, source
      |      ORDER BY r, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
      |  FROM t)
      |SELECT lang, source, CAST(FLOOR(pre / 256.0) AS BIGINT) AS bin_id,
      |  count(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
      |FROM c GROUP BY lang, source, bin_id
      |ORDER BY lang, source, bin_id""".stripMargin

  /** X6d — weighted mixture sampling: the "data mix" stage of training
    * assembly. Each source is down-sampled to a target rate by a
    * deterministic hash-Bernoulli draw — uniform u from the md5 of the
    * doc id against the source's rate — so the mix is bit-reproducible
    * on any engine and any rerun, and composes with incremental
    * ingestion (a doc's fate depends only on its own id, never on the
    * rest of the data). Pure narrow map; the only shuffle is the
    * summary aggregate. The u and the rates are exact binary fractions
    * (k/2¹⁶ vs .25/.5/1.0), so the comparison is portable across
    * engines — no float-rounding edge.
    */
  def x6Mixture(s: SparkSession, dir: String): DataFrame = {
    val u = conv(substring(md5(concat(lit("mix:"), col("doc_id").cast("string"))), 1, 4), 16, 10)
      .cast("long").cast("double") / lit(65536.0)
    val rate = when(col("source").isin("src0", "src1", "src2", "src3", "src4"), 1.0)
      .when(col("source").isin("src5", "src6", "src7", "src8", "src9"), 0.5)
      .otherwise(0.25)
    Tables.documents(s, dir)
      .withColumn("keep", u < rate)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        min(when(col("keep"), col("doc_id"))).as("first_kept"))
      .orderBy("source")
  }

  val x6MixtureSql: String =
    """SELECT source, count(*) AS n_docs,
      |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  min(CASE WHEN keep THEN doc_id END) AS first_kept
      |FROM (SELECT source, doc_id,
      |    (CAST(('0x' || substring(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) / 65536.0)
      |      < CAST(CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 1.0
      |              WHEN source IN ('src5','src6','src7','src8','src9') THEN 0.5
      |              ELSE 0.25 END AS DOUBLE) AS keep
      |  FROM documents)
      |GROUP BY source ORDER BY source""".stripMargin

  /** X6e — sharded export order: the deterministic global shuffle a
    * training run reads, realized scalably. Shard = hash bucket of the
    * shuffle key; position = rank within the shard by the same key. No
    * global sort ever happens — each shard orders independently under a
    * partitioned window, which is exactly the writer plan
    * `repartition(shard).sortWithinPartitions(key)` producing one file
    * per shard. At 100 TB the shard count grows with the corpus, so no
    * partition ever holds more than one shard's rows.
    */
  def x6ExportShards(s: SparkSession, dir: String): DataFrame = {
    val nshards = 8
    Tables.documents(s, dir)
      .select(col("doc_id"),
        md5(concat(lit("shuf:"), col("doc_id").cast("string"))).as("k"))
      .withColumn("shard", conv(substring(col("k"), 1, 4), 16, 10).cast("long") % nshards)
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("k"), col("doc_id"))))
      .select(col("shard"), col("pos"), col("doc_id"))
      .orderBy("shard", "pos")
  }

  val x6ExportShardsSql: String =
    """SELECT shard,
      |  CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id) AS INTEGER) AS pos,
      |  doc_id
      |FROM (SELECT doc_id, md5('shuf:' || CAST(doc_id AS VARCHAR)) AS k,
      |        CAST(('0x' || substring(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 8 AS shard
      |      FROM documents)
      |ORDER BY shard, pos""".stripMargin
}
