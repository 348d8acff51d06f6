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
    * Scale shape: one shuffle on the stratum key, per-group heap via the
    * rank filter. Strata far larger than k should be pre-thinned with a
    * hash-threshold filter (`md5 < t` with t sized to ~4k survivors)
    * before ranking, which keeps the per-group sort bounded; at fixture
    * scale the direct rank is the clearer form.
    */
  def x6StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val k = 20
    val w = Window.partitionBy(col("event_type"))
      .orderBy(md5(col("event_id").cast("string")), col("event_id"))
    Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("user_id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("event_type"), col("rk"), col("event_id"), col("user_id"))
      .orderBy("event_type", "rk")
  }

  val x6StratifiedSampleSql: String =
    """SELECT event_type, rk, event_id, user_id FROM (
      |  SELECT event_type, event_id, user_id,
      |    CAST(row_number() OVER (PARTITION BY event_type
      |      ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS INTEGER) AS rk
      |  FROM events) WHERE rk <= 20 ORDER BY event_type, rk""".stripMargin

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
      .withColumn("split",
        when(col("bucket") < 96, "train")
          .when(col("bucket") < 98, "validation")
          .otherwise("test"))
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
}
