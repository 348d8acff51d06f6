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
}
