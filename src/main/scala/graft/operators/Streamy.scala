package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Batch-mode twins of the streaming semantics (SURVEY.md §2.6, §5.2.5):
  * T1–T7 validated deterministically over the `events` fixture so the
  * DuckDB oracle can check them; the live Structured Streaming forms of
  * the same plans live in [[graft.streaming.Streams]] and are exercised
  * by the ScalaTest suite with file-backed micro-batches.
  */
object Streamy {

  /** T1/S7 — bounded drain: first 100 messages in offset order
    * (ref poll-until-quota loop, dags/kafka_to_mongo_pipeline.py:67-80;
    * event_id is the offset stand-in, FIXTURES.md).
    */
  def t1BoundedConsume(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy("event_id")
      .limit(100)

  val t1Sql: String =
    """SELECT event_id, user_id, event_type, value FROM events
      |ORDER BY event_id LIMIT 100""".stripMargin

  /** T5 — keyed dedup, first-arrival wins (streaming dropDuplicates
    * semantics made deterministic by offset order).
    */
  def t5DedupFirst(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .orderBy("user_id")
  }

  val t5Sql: String =
    """SELECT event_id, user_id, event_type, value FROM (
      |  SELECT event_id, user_id, event_type, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      |  FROM events
      |) WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** T7 [EXT] — event-time tumbling window (1 h) aggregate. In streaming
    * form this carries a watermark; the batch plan is the same hash
    * aggregate keyed by (window, event_type).
    */
  def t7Tumbling(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("window_start", "event_type")

  val t7TumblingSql: String =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** T7 [EXT] — sliding window (1 h wide, 30 min slide): each event lands
    * in exactly two epoch-aligned windows.
    */
  def t7Sliding(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))
      .orderBy("window_start", "event_type")

  val t7SlidingSql: String =
    """WITH exploded AS (
      |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, event_type FROM events
      |  UNION ALL
      |  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', event_type FROM events
      |)
      |SELECT window_start, event_type, COUNT(*) AS n
      |FROM exploded GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** T7 [EXT] — session windows: 30-min-gap sessions per user
    * (session_window in batch; gaps-and-islands is the SQL twin). A new
    * session starts when the gap is >= the timeout, matching Spark's
    * half-open [start, last+gap) session interval.
    */
  def t7Session(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      // emit + cut in integral MICROSECONDS (the t8 discipline): Spark
      // normalizes a legacy nanos footer to µs while DuckDB keeps ns, so
      // a raw-ts emission would mismatch at sub-µs precision on the next
      // fixture regeneration — the recorded q1-era incident shape
      .select(Tables.epochUs(col("session_window.start")).as("session_start"),
        col("user_id"), col("n_events"))
      .orderBy("user_id", "session_start")

  val t7SessionSql: String =
    """WITH marked AS (
      |  SELECT user_id, ts,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
      |              OVER (PARTITION BY user_id ORDER BY ts)
      |              >= 1800000000
      |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |), islands AS (
      |  SELECT user_id, ts,
      |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      |  FROM marked
      |)
      |SELECT epoch_us(MIN(ts)) AS session_start, user_id, COUNT(*) AS n_events
      |FROM islands GROUP BY user_id, session_no
      |ORDER BY user_id, session_start""".stripMargin
}
