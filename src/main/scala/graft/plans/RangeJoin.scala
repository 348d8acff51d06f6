package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Exact, Tables}

/** R4b [EXT] — binned range join: the big×big scale form of R4.
  *
  * R4 (`Relational.r4RangeJoin`) handles a value-band theta join by
  * broadcasting the small side — the right call when one side fits in
  * memory, and what Spark itself would pick (BroadcastNestedLoopJoin).
  * When BOTH sides are fact-table sized (the 100 TB case: every lineitem
  * against every order's shipping window), a nested-loop over a
  * non-broadcastable side is quadratic death. The standard fix — what
  * Databricks' range-join hint and DuckDB's IEJoin solve in the engine —
  * can be expressed declaratively on stock Spark: quantize the range
  * dimension into fixed-width bins, explode each interval to the bins it
  * overlaps, equi-join on the bin id (shuffle hash / sort-merge — both
  * partition-parallel), and re-check the exact predicate on the
  * candidates. Shuffle volume is O(points + intervals × bins-per-interval)
  * and the per-bin work is the true candidate count, not |L|×|R|.
  *
  * Reference anchor: the reference's pandas stage has no range join at
  * all (closest is the value-band filter family in
  * dags/etl_data_pipeline_mongodb_complex.py:50-55); this operator is the
  * [EXT] scale path for interval semantics (SURVEY.md §2.8 escalation
  * step (a): compose existing operators before custom plans).
  */
object RangeJoin {

  /** Generic point-in-interval equi-bin join.
    *
    * Joins `points` rows to `intervals` rows where
    * `points(pointCol) ∈ [intervals(loCol), intervals(hiCol))` — all three
    * columns must be integral (cast dates to epoch days first) and named
    * distinctly across the two frames.
    *
    * `binWidth` trades explode factor against candidate density: each
    * interval lands in `⌈width / binWidth⌉ (+1)` bins, so pick it near the
    * typical interval width. A (point, interval) pair can only meet in
    * the point's own bin, so the bin join produces no duplicates and
    * needs no post-dedup.
    *
    * Robustness (both guards verified in Round4Spec):
    *  - reversed/empty intervals (`hi <= lo`, or null bounds) generate NO
    *    bins — without the guard `sequence` silently DESCENDS on a
    *    reversed interval, manufacturing |lo−hi|/binWidth junk bins per
    *    row that the residual filter then has to discard (or an OOM when
    *    the reversal is large);
    *  - before committing to the binned plan, the TRUE worst-case explode
    *    factor is measured with one narrow aggregate over the two bound
    *    columns; when any interval would explode past
    *    `maxBinsPerInterval`, fall back to the original theta join — the
    *    pre-rewrite plan — instead of materializing per-row arrays that
    *    can hit Spark's sequence-length limit. A query that would run
    *    (however slowly) must never be turned into a runtime failure by
    *    an optimization.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Long, maxBinsPerInterval: Long = 4096): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binLo = floor(col(loCol) / binWidth).cast("long")
    // hi is exclusive: the last covered value is hi-1
    val binHi = floor((col(hiCol) - 1) / binWidth).cast("long")
    // NOTE: this width check is an EAGER action — constructing the frame
    // runs one narrow aggregate over the intervals' two bound columns
    // (explaining the query therefore runs that job too). Deliberate:
    // the strategy choice must be made before the plan exists.
    val widest = intervals.agg(max(binHi - binLo + 1)).head.get(0)
    if (widest != null && widest.asInstanceOf[Long] > maxBinsPerInterval)
      // the fallback is HINTED: un-hinted, BinnedRangeJoinRule (installed
      // by GraftExtensions) would rewrite this exact theta join back into
      // the binned form the measurement just rejected. The hint also
      // picks the honest both-sides-large strategy — shuffle-replicate
      // NL, partition-parallel — instead of broadcasting a fact table.
      return points.join(intervals.hint("shuffle_replicate_nl"),
        col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
    val p = points.withColumn("__gr_pbin",
      floor(col(pointCol) / binWidth).cast("long"))
    val iv = intervals.withColumn("__gr_ibin",
      explode(when(binLo <= binHi, sequence(binLo, binHi))
        .otherwise(array().cast("array<long>"))))
    p.join(iv,
        p("__gr_pbin") === iv("__gr_ibin") &&
          col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__gr_pbin", "__gr_ibin")
  }

  /** R4b query — pairs (lineitem shipped in January 1996) × (orders whose
    * 7-day shipping window contains that ship date), aggregated per
    * order priority. Both join inputs are fact tables; the plan must be
    * a shuffle join on the bin key (pinned in PlanSpec — no
    * BroadcastNestedLoopJoin even with broadcasting disabled).
    */
  def r4bBinnedRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val epoch = lit("1970-01-01").cast("date")
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-02-01").cast("timestamp"))
      .select(col("l_extendedprice"),
        datediff(col("l_shipdate").cast("date"), epoch).as("ship_day"))
    val ord = Tables.orders(s, dir)
      .select(col("o_orderpriority"),
        datediff(col("o_orderdate").cast("date"), epoch).as("win_start"))
      .withColumn("win_end", col("win_start") + 7)
    pointInInterval(li, "ship_day", ord, "win_start", "win_end", binWidth = 7)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_pairs"),
        Exact.dsum(col("l_extendedprice"), 2).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  /** DuckDB twin: the same range predicate as a plain theta join (DuckDB
    * plans it as an IEJoin internally — same results, different engine
    * strategy). Fixture timestamps are midnight-aligned (FIXTURES.md), so
    * day arithmetic here equals the Spark side's epoch-day arithmetic.
    */
  val r4bSql: String =
    """SELECT o_orderpriority, count(*) AS n_pairs,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price
      |FROM lineitem JOIN orders
      |  ON l_shipdate >= o_orderdate AND l_shipdate < o_orderdate + INTERVAL 7 DAY
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-02-01'
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
}
