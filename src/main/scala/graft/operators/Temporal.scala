package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** [EXT] Temporal operators: as-of join and batch sessionization.
  *
  * The reference's event loop attributes per-record context by arrival
  * order (dags/kafka_to_mongo_pipeline.py:67-80 processes records against
  * the mutable store state at poll time); the declarative analogues are
  * the as-of join (latest matching fact at-or-before each event) and
  * gap-based sessionization — both core training-data-pipeline shapes
  * (feature attribution, conversation/session assembly).
  */
object Temporal {

  /** R12 [EXT] — as-of join: each click joined to the user's latest
    * purchase at-or-before the click time.
    *
    * Spark lacks a native as-of join; the scale-safe formulation is the
    * union trick (the Flink/kdb discipline): tag both sides, union, one
    * window pass per key ordered by (ts, side) carrying the last non-null
    * right payload forward, then keep left rows. ONE shuffle on the key —
    * never a per-key loop, never a range cross-join. Purchases sort
    * before clicks at equal ts (side 0 < 1), giving >= (inclusive) as-of
    * semantics, which is exactly DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`
    * — the oracle twin.
    */
  def r12AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(1).as("side"),
        lit(null).cast("long").as("p_event_id"),
        lit(null).cast("double").as("p_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(null).cast("long").as("event_id"),
        lit(0).as("side"),
        col("event_id").as("p_event_id"),
        col("value").as("p_value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE last() carrying the whole purchase payload as a struct (null on
    // click rows, non-null on every purchase row): two independent
    // ignoreNulls windows would pair one purchase's id with an EARLIER
    // purchase's value whenever a purchase carries a null value — a row
    // that never existed, and a divergence from the row-atomic ASOF twin
    clicks.unionByName(purchases)
      .withColumn("__p", last(
        when(col("side") === 0, struct(col("p_event_id"), col("p_value"))),
        ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"),
        col("__p.p_event_id").as("purchase_id"), col("__p.p_value").as("purchase_value"))
      .orderBy("user_id", "click_ts")
  }

  val r12AsofJoinSql: String =
    """SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
      |  p.event_id AS purchase_id, p.value AS purchase_value
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id AND c.ts >= p.ts
      |ORDER BY c.user_id, click_ts""".stripMargin

  /** T8 [EXT] — batch sessionization twin of
    * [[graft.streaming.Streams.sessionize]]: a new session starts when
    * the gap to the previous event of the same user exceeds 30 minutes.
    * Classic two-window form — lag to flag session starts, running sum to
    * number them — then one aggregate per (user, session). Gaps compare
    * in integral microseconds ([[Tables.epochUs]] / DuckDB `epoch_us`) so
    * both engines make the identical cut whichever timestamp flavor the
    * fixture footer carries; the emitted `ts` columns stay footer-faithful
    * for oracle symmetry. One shuffle on user_id; both windows reuse the
    * same partitioning (a single sort, no second exchange).
    */
  def t8SessionizeBatch(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"))
      .withColumn("prev_us", lag(Tables.epochUs(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          Tables.epochUs(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("session_no", sum(col("new_sess")).over(run))
      .groupBy(col("user_id"), col("session_no"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_no")
  }

  val t8SessionizeBatchSql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts,
      |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800 * 1000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM (
      |    SELECT user_id, ts,
      |      lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
      |    FROM events)),
      |numbered AS (
      |  SELECT user_id, ts,
      |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      |  FROM flagged)
      |SELECT user_id, session_no, min(ts) AS session_start, max(ts) AS session_end,
      |  count(*) AS n_events
      |FROM numbered GROUP BY user_id, session_no
      |ORDER BY user_id, session_no""".stripMargin

  /** T12 [EXT] — time-series resample with LOCF gap fill: each user's
    * event stream becomes a dense hourly grid carrying the last
    * observation at or before each grid point — the standard
    * feature-store/training-label alignment step.
    *
    * Three stages, all partitioned by user: last event per (user, hour)
    * (rank-1 window), per-user grid expansion (`sequence` + explode — a
    * narrow generator, no driver loop), and a running
    * last-non-null window over grid order for the carry-forward. At
    * 100 TB the grid explodes per user in parallel and no partition
    * holds more than one user's span; the carried value never crosses a
    * partition boundary.
    */
  def t12ResampleLocf(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).filter(col("user_id") < 10)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val wLast = Window.partitionBy(col("user_id"), col("h"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val hourly = ev
      .withColumn("h", date_trunc("hour", col("ts")))
      .withColumn("rk", row_number().over(wLast))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("h"), col("value").as("v"))
    val grid = ev.groupBy(col("user_id"))
      .agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      .select(col("user_id"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val wLocf = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "h"), "left")
      .withColumn("value_locf", last(col("v"), ignoreNulls = true).over(wLocf))
      .select(col("user_id"), col("h").as("grid_ts"), col("value_locf"))
      .orderBy("user_id", "grid_ts")
  }

  val t12ResampleLocfSql: String =
    """WITH hourly AS (
      |  SELECT user_id, h, v FROM (
      |    SELECT user_id, date_trunc('hour', ts) AS h, value AS v,
      |      row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
      |        ORDER BY ts DESC, event_id DESC) AS rk
      |    FROM events WHERE user_id < 10) WHERE rk = 1),
      |span AS (
      |  SELECT user_id, date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
      |  FROM events WHERE user_id < 10 GROUP BY user_id),
      |grid AS (
      |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM span)
      |SELECT g.user_id AS user_id, g.h AS grid_ts,
      |  last_value(hr.v IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.h
      |    ROWS UNBOUNDED PRECEDING) AS value_locf
      |FROM grid g LEFT JOIN hourly hr ON g.user_id = hr.user_id AND g.h = hr.h
      |ORDER BY user_id, grid_ts""".stripMargin

  /** R15 [EXT] — SCD type-2 dimension build from a change log: the
    * event stream is compressed to state-CHANGE rows per user (drop
    * events equal to the previous state), each change opens a validity
    * interval [valid_from, valid_to) closed by the next change;
    * the open interval is the current state. The standard
    * slowly-changing-dimension construction every warehouse maintains.
    *
    * Both window passes (lag to detect changes, lead to close
    * intervals) partition by user_id — one shuffle, one sort, the
    * second window reuses the first's ordering. At 100 TB the change
    * log is date-partitioned and the rebuild is incremental per
    * partition; the per-key window never holds more than one user's
    * history.
    */
  def r15Scd2(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_type").as("state"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "valid_from")
  }

  val r15Scd2Sql: String =
    """WITH ordered AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |changes AS (
      |  SELECT user_id, event_id, ts, event_type FROM ordered
      |  WHERE prev IS NULL OR prev != event_type)
      |SELECT user_id, event_type AS state, ts AS valid_from,
      |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
      |FROM changes ORDER BY user_id, valid_from""".stripMargin
}
