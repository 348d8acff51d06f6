package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{Exact, Tables}

/** Reference-parity relational surface (SURVEY.md §2.2–2.5).
  *
  * Every query is a pure lazy DataFrame plan — Catalyst pushes the filters
  * and projections into the Parquet scan, plans 2-phase hash aggregates,
  * and keeps the whole chain inside whole-stage codegen. Queries are
  * totally ordered (SURVEY.md N4) so the DuckDB oracle hash-compare is
  * deterministic.
  */
object Relational {

  /** Flagship (SURVEY.md §7.2 slice 0): S3-scan → P1 drop-null → R5 hash
    * aggregate → R8 sort. "Cleaned revenue by returnflag/linestatus" —
    * the shape of TPC-H Q1. Ref: etl_data_pipeline.py:18-24 (read→dropna)
    * composed with a grouped aggregate.
    */
  def q1Revenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .na.drop("any") // P1: pandas dropna() parity (fixture has no nulls; semantics unit-tested)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Exact.dsum(col("l_quantity"), 2).as("sum_qty"),
        Exact.dsum(col("l_extendedprice"), 2).as("sum_base_price"),
        Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        Exact.davg(col("l_quantity")).as("avg_qty"),
        Exact.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1RevenueSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      |  COUNT(*) AS cnt
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // --- R1: shuffle equi-joins across the star schema ------------------------
  // lineitem⋈orders⋈customer: revenue per market segment. The two big
  // tables shuffle-join on the order key (sort-merge or shuffled-hash,
  // Catalyst/AQE picks); customer is small relative to the fact tables and
  // auto-broadcasts under the default threshold. Partial aggregation runs
  // map-side before the final shuffle on c_mktsegment.
  def r1JoinMulti(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("c_mktsegment")
  }

  val r1Sql: String =
    """SELECT c_mktsegment,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // --- R2: explicit broadcast join of dimension tables ----------------------
  // region/nation are O(10) rows at any scale factor — broadcast them so the
  // customer scan never shuffles. This is the 100 TB-safe star-join shape.
  def r2BroadcastJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"), Exact.dsum(col("c_acctbal"), 2).as("sum_acctbal"))
      .orderBy("r_name")
  }

  val r2Sql: String =
    """SELECT r_name, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS sum_acctbal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** R3 — left-semi join: customers that have at least one order (EXISTS). */
  def r3Semi(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_with_orders"))
      .orderBy("c_mktsegment")
  }

  val r3SemiSql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_with_orders FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** R3b — left-anti join: customers with no orders (NOT EXISTS). */
  def r3Anti(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  val r3AntiSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // --- R4: theta/range join ---------------------------------------------------
  // Non-equi band join: parts priced within (s_acctbal, s_acctbal+100].
  // Spark plans BroadcastNestedLoopJoin with supplier broadcast — correct
  // here because one side is dimension-sized; a fact×fact band join at
  // 100 TB would instead bucket both sides into overlapping ranges first.
  def r4RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
    val sup = Tables.supplier(s, dir)
    p.join(broadcast(sup),
        p("p_retailprice") > sup("s_acctbal") && p("p_retailprice") <= sup("s_acctbal") + 100.0)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_pairs"), countDistinct(col("s_suppkey")).as("n_suppliers"))
      .orderBy("p_brand")
  }

  val r4Sql: String =
    """SELECT p_brand, COUNT(*) AS n_pairs, COUNT(DISTINCT s_suppkey) AS n_suppliers
      |FROM part JOIN supplier
      |  ON p_retailprice > s_acctbal AND p_retailprice <= s_acctbal + 100.0
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** R5 — multi-function hash aggregate (partial+final 2-phase). */
  def r5Agg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        Exact.davg(col("o_totalprice")).as("avg_price"),
        countDistinct(col("o_custkey")).as("n_customers"))
      .orderBy("o_orderpriority")

  val r5Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_orders,
      |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(o_totalprice) AS avg_price,
      |  COUNT(DISTINCT o_custkey) AS n_customers
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** R5b — salted two-phase aggregation, the skew-mitigation pattern for
    * 100 TB hot keys: stage 1 pre-aggregates on (key, salt) so the
    * shuffle spreads each hot key over 32 reducers; stage 2 merges the 32
    * partials per key. Semantics identical to the direct groupBy (sums
    * and counts are associative) — same oracle shape as a plain
    * aggregate, which is exactly the point: salting is a physical
    * rewrite, not a semantic one. l_returnflag has cardinality 3 over
    * 600 k+ rows — the canonical pathological key. (AQE skew-join
    * splitting covers the join analogue at runtime; this is the explicit
    * form for aggregations.)
    */
  def r5SaltedAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .withColumn("__salt", pmod(xxhash64(col("l_orderkey")), lit(32)))
      .groupBy(col("l_returnflag"), col("__salt"))
      .agg(
        count(lit(1)).as("pn"),
        sum(col("l_quantity").cast("decimal(28,2)")).as("pq"),
        max(col("l_extendedprice")).as("pm"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("pn")).as("n_items"),
        sum(col("pq")).cast("double").as("sum_qty"),
        max(col("pm")).as("max_price"))
      .orderBy("l_returnflag")

  val r5SaltedSql: String =
    """SELECT l_returnflag, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
      |  MAX(l_extendedprice) AS max_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** R5c — exact grouped percentiles (linear interpolation — the same
    * definition as the oracle's `quantile_cont`). Exact percentile sorts
    * within groups; the 100 TB path is [[r5ApproxPercentiles]]'s
    * fixed-size KLL-style sketch, pinned against this query in
    * PropertySpec.
    */
  def r5Percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.75)"), 4).as("p75"),
        round(expr("percentile(o_totalprice, 0.95)"), 4).as("p95"))
      .orderBy("o_orderstatus")

  val r5PercentilesSql: String =
    """SELECT o_orderstatus,
      |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
      |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      |  round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
      |  round(quantile_cont(o_totalprice, 0.95), 4) AS p95
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** R5c' — the sketch form (approx_percentile): no shuffle of raw
    * values, constant memory per group. Raw sketch output is
    * engine-specific, so the QUERY carries its own tolerance gate: it
    * computes both the sketch and the exact percentile and emits the
    * exact value plus a boolean |approx−exact|/exact ≤ 1% check — the
    * oracle recomputes the exact side and asserts the boolean TRUE, so
    * the sketch's accuracy is driver-checked, not just unit-pinned. (The
    * production path is the sketch alone; the exact twin here is the
    * gate's yardstick, same discipline as the LSH-vs-exact dedup twins.)
    */
  def r5ApproxPercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("approx_percentile(o_totalprice, 0.5, 10000)").as("p50_approx"),
        expr("percentile(o_totalprice, 0.5)").as("p50_exact"))
      .select(col("o_orderstatus"), round(col("p50_exact"), 4).as("p50_exact"),
        (abs(col("p50_approx") - col("p50_exact")) / col("p50_exact") <= 0.01)
          .as("approx_within_tol"))
      .orderBy("o_orderstatus")

  val r5ApproxPercentilesSql: String =
    """SELECT o_orderstatus, round(quantile_cont(o_totalprice, 0.5), 4) AS p50_exact,
      |  TRUE AS approx_within_tol
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** R6 — distinct + exact count-distinct. */
  def r6Distinct(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_nationkey"), col("c_mktsegment")).distinct()
      .orderBy("c_nationkey", "c_mktsegment")

  val r6Sql: String =
    """SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
      |ORDER BY c_nationkey, c_mktsegment""".stripMargin

  /** R6b — approx_count_distinct (HLL++), the 100 TB cardinality path:
    * a fixed-size sketch per partition merges at the driver — no shuffle
    * of distinct values. DuckDB's sketch differs, so the QUERY gates
    * itself: it computes the sketch AND the exact count and emits the
    * exact value plus a boolean |approx−exact|/exact ≤ 2×rsd check —
    * the oracle recomputes the exact side and asserts the boolean TRUE.
    * (Production uses the sketch alone — no distinct-value shuffle; the
    * exact aggregate here is the gate's yardstick.)
    */
  def r6Approx(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")) / col("exact_parts") <= 0.04)
          .as("approx_within_tol"))

  val r6ApproxSql: String =
    """SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      |  TRUE AS approx_within_tol
      |FROM lineitem""".stripMargin

  /** R6d [EXT] — MERGEABLE distinct sketches, the shard-parallel form a
    * 100 TB pipeline actually runs: each shard builds its own
    * Datasketches HLL over its rows (`hll_sketch_agg`), the shard
    * sketches union WITHOUT rescanning any data (`hll_union_agg` — a
    * kilobyte-sized merge, the property that lets per-day/per-shard
    * sketches roll up into corpus-wide distinct counts), and the merged
    * estimate self-gates against the exact count (the
    * `r6_approx_distinct` discipline: DuckDB cannot reproduce the
    * sketch, so the oracle asserts the in-query tolerance boolean and
    * the exact value). Map-side partial aggregation applies at both
    * levels, so the shuffle carries 16 sketches, never rows.
    */
  def r6HllShards(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val merged = ev
      .withColumn("shard", pmod(col("event_id"), lit(16)))
      .groupBy(col("shard")).agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_users"))
    val exact = ev.agg(countDistinct(col("user_id")).as("exact_users"))
    merged.crossJoin(exact)
      .select(col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) / col("exact_users") <= 0.04)
          .as("merged_within_tol"),
        lit(16).as("n_shards"))
  }

  val r6HllShardsSql: String =
    """SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  TRUE AS merged_within_tol, 16 AS n_shards
      |FROM events""".stripMargin

  /** R6c — the exact distinct count the approx sketch is judged against. */
  def r6DistinctCount(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))

  val r6DistinctCountSql: String =
    "SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts FROM lineitem"

  /** R6e [EXT] — mergeable THETA sketches: set algebra over shard-level
    * distinct sketches WITHOUT rescanning the shards. Per-event-type
    * theta sketches of user_id union into the global distinct count and
    * intersect into "users who did BOTH click and purchase" — the
    * cross-segment overlap question a 100 TB deployment answers from
    * stored per-segment sketches (HLL can union but never intersect;
    * theta is the sketch that buys set intersection/difference). Both
    * estimates self-gate against exact counts computed in the same
    * query (the `r6_approx_distinct` discipline — DuckDB cannot
    * reproduce the sketch, so the oracle asserts the tolerance boolean
    * and the exact values). Intersection error is bounded relative to
    * the UNION size, so its gate scales by exact_users. Default lgK=12
    * (4,096 retained hashes): the sketch is exact below that
    * cardinality and ~1.6% at millions — tolerance 0.05 holds across
    * every deployment scale.
    */
  def r6ThetaSetops(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val perType = ev.groupBy(col("event_type"))
      .agg(expr("theta_sketch_agg(user_id)").as("sk"))
    val unioned = perType
      .agg(expr("round(theta_sketch_estimate(theta_union_agg(sk)))").as("approx_users"))
    val both = perType.filter(col("event_type").isin("click", "purchase"))
      .agg(expr("round(theta_sketch_estimate(theta_intersection_agg(sk)))").as("approx_both"))
    val exactU = ev.agg(countDistinct(col("user_id")).as("exact_users"))
    val exactB = ev.filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("user_id"))
      .agg(countDistinct(col("event_type")).as("nt"))
      .filter(col("nt") === 2)
      .agg(count(lit(1)).as("exact_both"))
    unioned.crossJoin(broadcast(exactU)).crossJoin(broadcast(both))
      .crossJoin(broadcast(exactB))
      .select(col("exact_users"), col("exact_both"),
        (abs(col("approx_users") - col("exact_users")) / col("exact_users") <= 0.05)
          .as("union_within_tol"),
        (abs(col("approx_both") - col("exact_both")) <= col("exact_users") * 0.05)
          .as("inter_within_tol"))
  }

  val r6ThetaSetopsSql: String =
    """SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  (SELECT CAST(count(*) AS BIGINT) FROM (
      |     SELECT user_id FROM events WHERE event_type IN ('click', 'purchase')
      |     GROUP BY user_id HAVING count(DISTINCT event_type) = 2)) AS exact_both,
      |  TRUE AS union_within_tol, TRUE AS inter_within_tol
      |FROM events""".stripMargin

  /** R6f [EXT] — mergeable KLL quantile sketches: per-shard
    * `kll_sketch_agg_double` merges via `kll_sketch_merge_double`
    * without rescanning any shard — the quantile analogue of
    * [[r6HllShards]] (exact percentiles need a global sort or a
    * full-width hash agg; shard-level KLL is how a 100 TB deployment
    * serves p50/p95/p99 from stored per-partition state). Self-gate:
    * the merged sketch's quantile estimates are judged by their EXACT
    * RANK — one counting pass computes the fraction of values at or
    * below each estimate, which must sit within KLL's normalized rank
    * error of the target (default k=200 → ~1.65% at 99% confidence;
    * gate 0.03). Rank counts are integers, the rank division double —
    * deterministic across engines and partition orders.
    */
  def r6KllShards(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val est = ev
      .withColumn("shard", pmod(col("event_id"), lit(16)))
      .groupBy(col("shard")).agg(expr("kll_sketch_agg_double(value)").as("sk"))
      // kll_sketch_merge_double is a 2-ary scalar (no merge AGGREGATE
      // exists) — fold the 16 shard sketches with the aggregate HOF:
      // 16 KB-sized blobs on one row, never a rescan of any shard
      .agg(collect_list(col("sk")).as("sks"))
      .select(expr("aggregate(slice(sks, 2, size(sks) - 1), sks[0], " +
        "(acc, x) -> kll_sketch_merge_double(acc, x))").as("sk"))
      .select(expr("kll_sketch_get_quantile_double(sk, 0.5)").as("est_p50"),
        expr("kll_sketch_get_quantile_double(sk, 0.95)").as("est_p95"),
        expr("kll_sketch_get_quantile_double(sk, 0.99)").as("est_p99"))
    ev.crossJoin(broadcast(est))
      .agg(count(lit(1)).as("n"),
        count(when(col("value") <= col("est_p50"), 1)).as("le50"),
        count(when(col("value") <= col("est_p95"), 1)).as("le95"),
        count(when(col("value") <= col("est_p99"), 1)).as("le99"))
      .select(col("n").as("exact_n"),
        (abs(col("le50") / col("n") - 0.5) <= 0.03).as("p50_within_tol"),
        (abs(col("le95") / col("n") - 0.95) <= 0.03).as("p95_within_tol"),
        (abs(col("le99") / col("n") - 0.99) <= 0.03).as("p99_within_tol"),
        lit(16).as("n_shards"))
  }

  val r6KllShardsSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS exact_n,
      |  TRUE AS p50_within_tol, TRUE AS p95_within_tol, TRUE AS p99_within_tol,
      |  16 AS n_shards
      |FROM events""".stripMargin

  /** R6g [EXT] — mergeable count-min frequency sketch: one CM sketch of
    * event_type (eps=0.001, confidence 0.99, fixed seed — deterministic
    * bytes) aggregated with map-side partial merge, probed driver-side
    * for each of the five event types against exact counts. The driver
    * step reads ONE sketch blob and five candidate labels — bounded
    * metadata, never data rows (the [[graft.streaming.BandStore]]
    * collect discipline). CM guarantees est ≥ exact and est ≤ exact +
    * eps·N w.h.p.; the gate asserts both sides.
    */
  def r6CmHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val bytes = ev
      .agg(expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)").as("cm"))
      .head.getAs[Array[Byte]](0)
    val cm = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val exact = ev.groupBy(col("event_type")).agg(count(lit(1)).as("exact_n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val n = exact.map(_._2).sum
    val bound = math.ceil(0.001 * n).toLong
    exact.toSeq.map { case (t, ex) =>
      val est = cm.estimateCount(t)
      (t, ex, est >= ex && est <= ex + bound)
    }.toDF("event_type", "exact_n", "cm_within_eps")
      .orderBy("event_type")
  }

  val r6CmHeavyHittersSql: String =
    """SELECT event_type, count(*) AS exact_n, TRUE AS cm_within_eps
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** R7 — rollup with grouping_id (subtotals + grand total). */
  def r7Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .rollup(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n"), Exact.dsum(col("c_acctbal"), 2).as("sum_acctbal"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), col("c_mktsegment").asc_nulls_first, col("c_nationkey").asc_nulls_first)

  val r7Sql: String =
    """SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS sum_acctbal,
      |  CAST(GROUPING(c_mktsegment, c_nationkey) AS BIGINT) AS gid
      |FROM customer GROUP BY ROLLUP(c_mktsegment, c_nationkey)
      |ORDER BY gid, c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""".stripMargin

  /** R7b — cube over two low-cardinality dims. */
  def r7Cube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  val r7CubeSql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** R8 — global top-k: Spark plans TakeOrderedAndProject (per-partition
    * heap + single k-row merge at the driver — no full sort at any scale).
    */
  def r8TopK(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(10)

  val r8Sql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin

  /** R9 — window functions: ranking, analytic (lag/lead), running frame.
    * One hash shuffle on the partition key; frames evaluated per-partition.
    */
  def r9Window(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("rank_price",
        rank().over(Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_key", lead(col("o_orderkey"), 1).over(w))
      .withColumn("running_spend",
        sum(col("o_totalprice").cast("decimal(28,2)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val r9Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  CAST(row_number() OVER w AS INTEGER) AS rn,
      |  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rank_price,
      |  lag(o_totalprice, 1) OVER w AS prev_price,
      |  lead(o_orderkey, 1) OVER w AS next_key,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** R1b — full outer join with null-filled sides: high-balance
    * customers ⟗ per-customer order counts (each side holds rows the
    * other lacks). Same shuffle discipline as the inner form; outer
    * joins simply keep the unmatched build/probe rows.
    */
  def r1OuterJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_acctbal") > 9000)
      .select(col("c_custkey"), col("c_name"))
    val ords = Tables.orders(s, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    cust.join(ords, cust("c_custkey") === ords("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_name"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy("custkey")
  }

  val r1OuterJoinSql: String =
    """SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey, c.c_name,
      |  coalesce(o.n_orders, 0) AS n_orders
      |FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000) c
      |FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey) o
      |  ON c.c_custkey = o.o_custkey
      |ORDER BY custkey""".stripMargin

  /** R14 — the SQL entry path: fixture tables registered as temp views,
    * the query given as SQL text (`spark.sql`), including an
    * uncorrelated scalar subquery. Identical Catalyst plan to the
    * DataFrame form — proof that a SQL-preferring user of the reference
    * can drive this engine with strings. The subquery threshold is
    * decimal-summed on both engines so the float cut is identical.
    */
  def r14SqlEntry(s: SparkSession, dir: String): DataFrame = {
    // per-call view names, dropped once the text is ANALYZED (the
    // returned frame holds the resolved plan): session-global names let
    // a second caller with a different dir replace the views between
    // registration and analysis — the first caller would silently bind
    // the second's tables — and leaked catalog entries shadow user views
    val tag = java.util.UUID.randomUUID.toString.replace("-", "")
    val ov = s"orders_v_$tag"
    val cv = s"customer_v_$tag"
    Tables.orders(s, dir).createOrReplaceTempView(ov)
    Tables.customer(s, dir).createOrReplaceTempView(cv)
    try s.sql(
      s"""SELECT c.c_mktsegment, count(*) AS n_big,
        |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue
        |FROM $ov o JOIN $cv c ON o.o_custkey = c.c_custkey
        |WHERE o.o_totalprice > (
        |  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) / count(*)
        |  FROM $ov)
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin)
    finally { s.catalog.dropTempView(ov); s.catalog.dropTempView(cv) }
  }

  val r14SqlEntrySql: String =
    """SELECT c.c_mktsegment, count(*) AS n_big,
      |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE o.o_totalprice > (
      |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) / count(*)
      |  FROM orders)
      |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin

  /** R9c — ranking/distribution window family: dense_rank, ntile,
    * percent_rank, cume_dist. Unique (price, key) ordering keeps the
    * distribution functions deterministic across engines.
    */
  def r9Ranks(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("dr", dense_rank().over(w))
      .withColumn("ntile4", ntile(4).over(w))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .orderBy("o_orderstatus", "o_orderkey")
  }

  val r9RanksSql: String =
    """SELECT o_orderstatus, o_orderkey, o_totalprice,
      |  CAST(dense_rank() OVER w AS INTEGER) AS dr,
      |  CAST(ntile(4) OVER w AS INTEGER) AS ntile4,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderstatus, o_orderkey""".stripMargin

  /** R13 [EXT] — pivot: order counts and exact price sums per priority,
    * one column group per status. Explicit pivot values skip the
    * distinct-scan pass; the plan is ONE two-phase hash aggregate with
    * conditional branches — no per-column shuffles.
    */
  def r13Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(Exact.dsum(col("o_totalprice"), 2))
      .select(col("o_orderpriority"),
        col("F").as("sum_f"), col("O").as("sum_o"), col("P").as("sum_p"))
      .orderBy("o_orderpriority")

  val r13PivotSql: String =
    """SELECT o_orderpriority,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(28,2)) END) AS DOUBLE) AS sum_f,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(28,2)) END) AS DOUBLE) AS sum_o,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(28,2)) END) AS DOUBLE) AS sum_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** R13b [EXT] — unpivot (melt): the wide pivot back to long
    * (priority, status, sum) form — a narrow expand projection, no
    * shuffle beyond the pivot's own aggregate. Null cells (absent
    * combinations) are dropped, matching the UNION-ALL oracle.
    */
  def r13Unpivot(s: SparkSession, dir: String): DataFrame =
    r13Pivot(s, dir)
      .unpivot(Array(col("o_orderpriority")),
        Array(col("sum_f"), col("sum_o"), col("sum_p")),
        "status", "sum_price")
      .filter(col("sum_price").isNotNull)
      .withColumn("status", upper(substring(col("status"), 5, 1)))
      .orderBy("o_orderpriority", "status")

  val r13UnpivotSql: String =
    """WITH p AS (
      |  SELECT o_orderpriority,
      |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(28,2)) END) AS DOUBLE) AS sum_f,
      |    CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(28,2)) END) AS DOUBLE) AS sum_o,
      |    CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(28,2)) END) AS DOUBLE) AS sum_p
      |  FROM orders GROUP BY o_orderpriority)
      |SELECT o_orderpriority, status, sum_price FROM (
      |  SELECT o_orderpriority, 'F' AS status, sum_f AS sum_price FROM p
      |  UNION ALL SELECT o_orderpriority, 'O', sum_o FROM p
      |  UNION ALL SELECT o_orderpriority, 'P', sum_p FROM p)
      |WHERE sum_price IS NOT NULL
      |ORDER BY o_orderpriority, status""".stripMargin

  /** R10 — intersect: nations having both a customer and a supplier. */
  def r10Intersect(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
      .intersect(Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  val r10IntersectSql: String =
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin

  /** R10c — union-distinct: one row per nation key present on either
    * side (union + distinct collapses to a single dedup shuffle).
    */
  def r10UnionDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
      .union(Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")))
      .distinct()
      .orderBy("nationkey")

  val r10UnionDistinctSql: String =
    """SELECT c_nationkey AS nationkey FROM customer
      |UNION SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin

  /** R10b — except: nations with customers but no suppliers. */
  def r10Except(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
      .except(Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  val r10ExceptSql: String =
    """SELECT c_nationkey AS nationkey FROM customer
      |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin

  /** R11 — scalar function sampler: string/date/math built-ins, all
    * whole-stage-codegen'd. Cross-dialect-safe subset (no libm functions
    * whose last ulp differs between JVM and C).
    */
  /** R7c — explicit GROUPING SETS (the general form rollup/cube are
    * sugar for): aggregate at (mktsegment, nationkey), (mktsegment), and
    * grand-total granularities in one pass.
    */
  def r7GroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .groupingSets(
        Seq(Seq(col("c_mktsegment"), col("c_nationkey")), Seq(col("c_mktsegment")), Seq()),
        col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n"), grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), col("c_mktsegment").asc_nulls_first, col("c_nationkey").asc_nulls_first)

  val r7GroupingSetsSql: String =
    """SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
      |  CAST(GROUPING(c_mktsegment, c_nationkey) AS BIGINT) AS gid
      |FROM customer
      |GROUP BY GROUPING SETS ((c_mktsegment, c_nationkey), (c_mktsegment), ())
      |ORDER BY gid, c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""".stripMargin

  /** R9b — explicit window frames: a 3-row moving average (ROWS frame)
    * and a value-range running count (RANGE frame) per customer.
    */
  def r9Frames(s: SparkSession, dir: String): DataFrame = {
    val byKey = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("moving_avg_3",
        round(avg(col("o_totalprice")).over(byKey.rowsBetween(-2, Window.currentRow)), 4))
      // fractional RANGE bounds need the SQL frame form (the Scala
      // rangeBetween API is Long-only)
      .withColumn("n_within_1000",
        expr("""count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)"""))
      .orderBy("o_custkey", "o_orderkey")
  }

  val r9FramesSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  round(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg_3,
      |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
      |    RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_within_1000
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** R11b — date/time function family over order dates. */
  def r11DateTime(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        to_date(date_trunc("month", col("o_orderdate"))).as("month_start"),
        datediff(col("o_orderdate"), lit("2024-01-01").cast("date")).as("days_since"),
        date_add(col("o_orderdate"), 30).as("due_date"),
        quarter(col("o_orderdate")).as("qtr"),
        dayofweek(col("o_orderdate")).as("dow"),
        last_day(col("o_orderdate")).as("month_end"))
      .orderBy("o_orderkey")

  val r11DateTimeSql: String =
    """SELECT o_orderkey,
      |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      |  CAST(datediff('day', DATE '2024-01-01', o_orderdate) AS INTEGER) AS days_since,
      |  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
      |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
      |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
      |  last_day(o_orderdate) AS month_end
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** R11c — array/struct function family: split, size, contains, sort,
    * indexing, slice, and struct field access.
    *
    * The array/struct ops all stay inside the query; the final projection
    * re-encodes non-scalar columns as strings (`array_join` / `concat_ws`)
    * because the driver's oracle comparator sorts rows in pandas, which
    * cannot hash ndarray/dict cells.
    */
  def r11ArrayStruct(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .withColumn("words", split(col("p_type"), " "))
      .withColumn("meta", struct(col("p_brand").as("brand"), col("p_size").as("sz")))
      .select(
        col("p_partkey"),
        array_join(col("words"), " ").as("words_str"),
        size(col("words")).as("n_words"),
        array_contains(col("words"), "BRASS").as("has_brass"),
        array_join(sort_array(col("words")), " ").as("sorted_words_str"),
        element_at(col("words"), 1).as("first_word"),
        array_join(slice(col("words"), 1, 2), " ").as("first_two_str"),
        concat_ws(":", col("meta").getField("brand"), col("meta").getField("sz")).as("meta_str"),
        col("meta").getField("sz").as("meta_size"))
      .orderBy("p_partkey")

  val r11ArrayStructSql: String =
    """SELECT p_partkey,
      |  array_to_string(string_split(p_type, ' '), ' ') AS words_str,
      |  CAST(len(string_split(p_type, ' ')) AS INTEGER) AS n_words,
      |  list_contains(string_split(p_type, ' '), 'BRASS') AS has_brass,
      |  array_to_string(list_sort(string_split(p_type, ' ')), ' ') AS sorted_words_str,
      |  string_split(p_type, ' ')[1] AS first_word,
      |  array_to_string(string_split(p_type, ' ')[1:2], ' ') AS first_two_str,
      |  concat_ws(':', p_brand, p_size) AS meta_str,
      |  p_size AS meta_size
      |FROM part ORDER BY p_partkey""".stripMargin

  /** R11d — map-function family over the dynamic JSON payload the
    * reference's Kafka messages carry (dags/kafka_to_mongo_pipeline.py:42-44):
    * map construction (`map`/`map_concat`/`map_from_entries`), key/value
    * extraction (`map_keys`/`map_values`/`element_at`), and `explode` of
    * a map to entry rows. Non-scalar intermediates stay inside the query;
    * the output is all scalars for the driver comparator.
    */
  def r11Map(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(s, dir)
      .withColumn("kv", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("m", map_concat(
        map(lit("k"), col("kv")),
        map(lit("uid"), col("user_id"))))
      .withColumn("m2", map_from_entries(array(
        struct(lit("k").as("key"), col("kv").as("value")),
        struct(lit("uid").as("key"), col("user_id").as("value")))))
    base.select(
        col("event_id"),
        size(col("m")).as("n_keys"),
        array_join(map_keys(col("m")), ",").as("keys_str"),
        array_join(transform(map_values(col("m")), _.cast("string")), ",").as("vals_str"),
        element_at(col("m"), lit("k")).as("k_val"),
        element_at(col("m2"), lit("uid")).as("uid_val"),
        explode(col("m")).as(Seq("key", "value")))
      .orderBy("event_id", "key")
  }

  val r11MapSql: String =
    """WITH base AS (
      |  SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS kv, user_id
      |  FROM events),
      |kvs AS (
      |  SELECT event_id, kv, user_id, 'k' AS key, kv AS value FROM base
      |  UNION ALL
      |  SELECT event_id, kv, user_id, 'uid' AS key, user_id AS value FROM base)
      |SELECT event_id, 2 AS n_keys, 'k,uid' AS keys_str,
      |  concat(CAST(kv AS VARCHAR), ',', CAST(user_id AS VARCHAR)) AS vals_str,
      |  kv AS k_val, user_id AS uid_val, key, value
      |FROM kvs ORDER BY event_id, key""".stripMargin

  /** R11e — string function family: initcap/reverse/translate/repeat/
    * lpad/split_part/levenshtein (edit distance doubles as a cheap
    * fuzzy-dedup primitive).
    */
  def r11Strings(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        initcap(lower(col("c_mktsegment"))).as("seg_title"),
        reverse(col("c_name")).as("name_rev"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("seg_tr"),
        repeat(substring(col("c_name"), 1, 2), 2).as("name2x"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("key_pad"),
        split_part(col("c_name"), lit("#"), lit(2)).as("name_num"),
        levenshtein(col("c_mktsegment"), lit("BUILDING")).as("lev_building"))
      .orderBy("c_custkey")

  val r11StringsSql: String =
    """SELECT c_custkey,
      |  upper(c_mktsegment[1]) || lower(c_mktsegment[2:]) AS seg_title,
      |  reverse(c_name) AS name_rev,
      |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
      |  repeat(substring(c_name, 1, 2), 2) AS name2x,
      |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_pad,
      |  split_part(c_name, '#', 2) AS name_num,
      |  CAST(levenshtein(c_mktsegment, 'BUILDING') AS INTEGER) AS lev_building
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** R11f — null-handling family: coalesce/nullif/greatest/least and a
    * null-flag projection, over derived nullable columns (fixtures carry
    * no raw NULLs — SURVEY N-notes).
    */
  def r11Nulls(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("f_price", when(col("o_orderstatus") === "F", col("o_totalprice")))
      .select(
        col("o_orderkey"),
        coalesce(col("f_price"), lit(0.0)).as("f_or_zero"),
        nullif(col("o_orderstatus"), lit("O")).as("status_nz"),
        greatest(col("o_totalprice"), lit(100000.0)).as("at_least"),
        least(col("o_totalprice"), lit(100000.0)).as("at_most"),
        col("f_price").isNull.cast("int").as("f_missing"))
      .orderBy("o_orderkey")

  val r11NullsSql: String =
    """SELECT o_orderkey,
      |  coalesce(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END, 0.0) AS f_or_zero,
      |  nullif(o_orderstatus, 'O') AS status_nz,
      |  greatest(o_totalprice, 100000.0) AS at_least,
      |  least(o_totalprice, 100000.0) AS at_most,
      |  CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END IS NULL AS INTEGER) AS f_missing
      |FROM orders ORDER BY o_orderkey""".stripMargin

  def r11Functions(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        concat_ws("|", col("o_orderstatus"), col("o_orderpriority")).as("status_prio"),
        substring(col("o_orderpriority"), 1, 1).as("prio_code"),
        lower(col("o_orderpriority")).as("prio_lower"),
        length(col("o_orderpriority")).as("prio_len"),
        regexp_extract(col("o_orderpriority"), "^(\\d+)-", 1).as("prio_num"),
        round(col("o_totalprice"), 1).as("price_rounded"),
        abs(col("o_totalprice") - 1000.0).as("price_abs_diff"),
        floor(col("o_totalprice")).as("price_floor"),
        ceil(col("o_totalprice")).as("price_ceil"),
        sqrt(col("o_totalprice")).as("price_sqrt"),
        (col("o_orderkey") % 7).as("key_mod"))
      .orderBy("o_orderkey")

  val r11Sql: String =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |  CAST(month(o_orderdate) AS INTEGER) AS o_month,
      |  concat_ws('|', o_orderstatus, o_orderpriority) AS status_prio,
      |  substring(o_orderpriority, 1, 1) AS prio_code,
      |  lower(o_orderpriority) AS prio_lower,
      |  CAST(length(o_orderpriority) AS INTEGER) AS prio_len,
      |  regexp_extract(o_orderpriority, '^(\d+)-', 1) AS prio_num,
      |  round(o_totalprice, 1) AS price_rounded,
      |  abs(o_totalprice - 1000.0) AS price_abs_diff,
      |  CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
      |  CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
      |  sqrt(o_totalprice) AS price_sqrt,
      |  o_orderkey % 7 AS key_mod
      |FROM orders ORDER BY o_orderkey""".stripMargin
}
