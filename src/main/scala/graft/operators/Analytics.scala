package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Exact, Tables}

/** Headline multi-join analytics over the star schema — the query shapes
  * a warehouse user of the engine runs daily (TPC-H Q3/Q5/Q10 forms,
  * re-expressed over the fixture star schema; reference anchor: the
  * pandas merge+groupby stages of dags/etl_data_pipeline_mongodb_complex.py
  * are 2-table degenerate cases of exactly these plans).
  *
  * These exist to exercise the whole planner at once: selective filters
  * pushed into every scan, big×big shuffle joins on the fact keys,
  * dimension broadcasts, two-phase aggregation, and top-k via
  * TakeOrderedAndProject. At 100 TB the fact-fact joins shuffle on
  * l_orderkey/o_orderkey (AQE sizes the partitions); every dimension side
  * stays broadcast.
  */
object Analytics {

  /** Q3 shape — shipping priority: revenue of unshipped lineitems for
    * BUILDING-segment customers, top 10 orders by revenue.
    */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-03-15").cast("timestamp")
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir).filter(col("o_orderdate") < cutoff)
    val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > cutoff)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      // exact decimal revenue → deterministic ties; l_orderkey breaks them
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15'
      |  AND l_shipdate > TIMESTAMP '1998-03-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** Q5 shape — local supplier volume: revenue in ASIA during 1996 where
    * the supplier and customer share a nation. Six-way join: two fact
    * tables shuffle on the order key; supplier joins on BOTH l_suppkey
    * and the customer's nation (the "local" constraint); region/nation
    * broadcast.
    */
  def q5LocalSupplier(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, dir)
    val c = Tables.customer(s, dir)
    val sup = Tables.supplier(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(sup, l("l_suppkey") === sup("s_suppkey") &&
        sup("s_nationkey") === c("c_nationkey"))
      .join(n, sup("s_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** Q10 shape — returned items: the 20 customers losing the most
    * revenue to returns in 1996 Q4.
    */
  def q10ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Sql: String =
    """SELECT c_custkey, c_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** Q4 shape — order-priority checking: orders of 1996Q3 with at least
    * one lineitem shipped more than 90 days after the order date,
    * counted per priority. The EXISTS subquery plans as a left-semi
    * join with a composite condition (equi key + range residual) — the
    * probe side short-circuits on first match, no duplication of the
    * orders side, and the selective date filter prunes the scan before
    * the shuffle.
    */
  def q4OrderPriority(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
    val l = Tables.lineitem(s, dir)
    o.join(l,
        o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late_orders"))
      .orderBy("o_orderpriority")
  }

  val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS n_late_orders
      |FROM orders o
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      |  AND o_orderdate < TIMESTAMP '1996-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o.o_orderkey
      |                AND l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Q18 shape — large-volume orders: orders whose total lineitem
    * quantity exceeds 250, with customer attribution, top 20 by
    * quantity. The HAVING subquery is a two-phase hash aggregate over
    * the biggest fact table; only its ~1% survivors join orders (AQE
    * shrinks that shuffle at runtime) and the customer join rides the
    * surviving keys. The top-k is TakeOrderedAndProject — never a full
    * sort.
    */
  def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(Exact.dsum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 250.0)
    Tables.orders(s, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(20)
  }

  val q18Sql: String =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
      |FROM (SELECT l_orderkey,
      |        CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) > 250.0) big
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY total_qty DESC, o_orderkey LIMIT 20""".stripMargin

  /** Q6 shape — forecasting revenue change: one selective filter-agg
    * over the biggest fact table, no joins at all. The plan the 100 TB
    * deployment cares about: every predicate (ship year, discount band,
    * quantity cap) reaches the parquet scan as PushedFilters, the
    * projection prunes to three columns, and the whole query is one
    * scan + partial/final agg — no shuffle of data rows, only of one
    * partial sum per partition.
    */
  def q6Forecast(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24.0)
      .agg(Exact.dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))

  val q6Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24.0""".stripMargin

  /** Q7 shape — volume shipping between two nations: the supplier's
    * nation comes through lineitem→supplier, the customer's through
    * lineitem→orders→customer, and only the two directed pairs between
    * NATION_1 and NATION_2 survive. Both nation joins broadcast (25
    * rows); supplier broadcasts under the default threshold; the one
    * real shuffle is lineitem⋈orders on the order key. The pair filter
    * lands AFTER both nation attributions, so it cannot be pushed below
    * either join — the shape exists to exercise a residual filter over
    * a multi-join result.
    */
  def q7VolumeShipping(s: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(s, dir).select(col("n_nationkey").as("s_nk"),
      col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, dir).select(col("n_nationkey").as("c_nk"),
      col("n_name").as("cust_nation"))
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    l.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7Sql: String =
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(SUM(CAST(volume AS DECIMAL(28,6))) AS DOUBLE) AS volume
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    year(l_shipdate) AS l_year,
      |    l_extendedprice * (1.0 - l_discount) AS volume
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-01-01'
      |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')))
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** Q8 shape — national market share: of the ECONOMY-part volume sold
    * to ASIA customers in 1996–1997, what fraction was supplied by
    * NATION_3, per order year. The share is a conditional-sum over
    * total-sum ratio — both sums exact decimal, the division in double,
    * so the quotient is bit-identical across engines. region/nation
    * broadcast twice (customer side gates the rows, supplier side
    * attributes them); part's type filter prunes before its join.
    */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val asiaNations = regionNations(s, dir, "ASIA")
      .select(col("n_nationkey").as("asia_nk"))
    val suppNation = Tables.nation(s, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val p = Tables.part(s, dir).filter(col("p_type") === "ECONOMY")
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    Tables.lineitem(s, dir)
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(asiaNations), col("c_nationkey") === col("asia_nk"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
      .withColumn("volume", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((Exact.dsum(when(col("supp_nation") === "NATION_3", col("volume"))
          .otherwise(lit(0.0))) / Exact.dsum(col("volume"))).as("mkt_share"))
      .orderBy("o_year")
  }

  val q8Sql: String =
    """SELECT year(o_orderdate) AS o_year,
      |  CAST(SUM(CAST(CASE WHEN n2.n_name = 'NATION_3'
      |        THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
      |      AS DECIMAL(28,6))) AS DOUBLE)
      |  / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |      AS DECIMAL(28,6))) AS DOUBLE) AS mkt_share
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |JOIN region ON n1.n_regionkey = r_regionkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY year(o_orderdate) ORDER BY o_year""".stripMargin

  /** Q9 shape — product-type profit by supplier nation and year. The
    * fixture has no partsupp table, so supply cost is modeled as 10% of
    * the part's retail price per unit — the JOIN/AGG shape (fact ×
    * part × supplier × nation, group by nation × year) is Q9's; only
    * the cost constant is synthetic. PROMO parts only (331 of 2,000 at
    * sf0.01), so the part join prunes the fact early.
    */
  def q9ProfitShape(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).filter(col("p_type") === "PROMO")
    val suppNation = Tables.nation(s, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("nation"))
    Tables.lineitem(s, dir)
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
      .withColumn("profit",
        col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
          col("p_retailprice") * lit(0.1) * col("l_quantity"))
      .groupBy(col("nation"), year(col("l_shipdate")).as("o_year"))
      .agg(Exact.dsum(col("profit")).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9Sql: String =
    """SELECT n_name AS nation, year(l_shipdate) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |    - p_retailprice * 0.1 * l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_type = 'PROMO'
      |GROUP BY n_name, year(l_shipdate)
      |ORDER BY nation, o_year DESC""".stripMargin

  /** Q14 shape — promotion revenue share for one ship month: a
    * conditional-over-total ratio on the lineitem×part join. part is
    * the broadcast side; the month filter prunes the fact scan at the
    * parquet level before the join.
    */
  def q14PromoRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
      .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
      .withColumn("volume", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .agg((lit(100.0) *
        Exact.dsum(when(col("p_type") === "PROMO", col("volume")).otherwise(lit(0.0))) /
        Exact.dsum(col("volume"))).as("promo_revenue_pct"))

  val q14Sql: String =
    """SELECT 100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
      |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
      |    AS DECIMAL(28,6))) AS DOUBLE)
      |  / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |    AS DECIMAL(28,6))) AS DOUBLE) AS promo_revenue_pct
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin

  /** Q15 shape — top supplier(s) of 1996Q1 by revenue. The classic form
    * compares each supplier's revenue to the global max; here the max
    * rides a broadcast single-row cross join (the suite's 1-row gate
    * idiom) instead of a partition-less window, which the PlanSpec
    * no-global-window pin forbids over unbounded input. Exact decimal
    * revenue makes the max and the equality deterministic; ties would
    * all surface (none at the fixture SFs — the orderBy pins output
    * order regardless).
    */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("total_revenue"))
    val top = rev.agg(max(col("total_revenue")).as("max_revenue"))
    rev.crossJoin(broadcast(top))
      .filter(col("total_revenue") === col("max_revenue"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  val q15Sql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
      |      AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** Q19 shape — discounted revenue under disjunctive brand/size/
    * quantity predicates: three (brand, size-range, quantity-range)
    * branches OR-ed together across the lineitem×part join. The branch
    * predicates mix columns from BOTH sides, so nothing beyond the
    * equi-key can push below the join — the shape exercises residual
    * disjunction evaluation inside the joined stream, with part
    * broadcast and the fact never shuffled.
    */
  def q19Disjunctive(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity") >= 1.0 && col("l_quantity") <= 11.0) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
          col("l_quantity") >= 10.0 && col("l_quantity") <= 20.0) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 50) &&
          col("l_quantity") >= 20.0 && col("l_quantity") <= 30.0))
      .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))

  val q19Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
      |    AS revenue,
      |  count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity >= 1.0 AND l_quantity <= 11.0)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
      |       AND l_quantity >= 10.0 AND l_quantity <= 20.0)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50
      |       AND l_quantity >= 20.0 AND l_quantity <= 30.0)""".stripMargin

  /** Q21 shape — suppliers who alone held up an order: for finished
    * orders, lineitems shipped >60 days after the order date where
    * SOME other supplier contributed to the same order (EXISTS → left
    * semi) but NO other supplier was also late (NOT EXISTS → left
    * anti). The fixture has no commit/receipt dates, so "late" is
    * ship-vs-order-date; the planner shape is Q21's: two correlated
    * subqueries against the same fact table become one semi and one
    * anti join on a composite (equi + inequality) condition, the
    * fact joined three times without ever being collected or
    * cross-producted.
    */
  def q21WaitingSupplier(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
    val l = Tables.lineitem(s, dir)
    val late = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("l_orderkey").as("lk"), col("l_suppkey").as("sk"),
        col("o_orderdate").as("od"))
    val others = l.select(col("l_orderkey").as("o_lk"), col("l_suppkey").as("o_sk"))
    val lateOthers = late.select(col("lk").as("a_lk"), col("sk").as("a_sk"))
    late
      .join(others, col("lk") === col("o_lk") && col("sk") =!= col("o_sk"), "left_semi")
      .join(lateOthers, col("lk") === col("a_lk") && col("sk") =!= col("a_sk"), "left_anti")
      .join(Tables.supplier(s, dir), col("sk") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(countDistinct(col("lk")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  val q21Sql: String =
    """WITH late AS (
      |  SELECT l_orderkey AS lk, l_suppkey AS sk
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'
      |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |SELECT s_name, CAST(count(DISTINCT lk) AS BIGINT) AS numwait
      |FROM late t
      |JOIN supplier ON t.sk = s_suppkey
      |WHERE EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = t.lk AND l2.l_suppkey <> t.sk)
      |  AND NOT EXISTS (SELECT 1 FROM late t2
      |                  WHERE t2.lk = t.lk AND t2.sk <> t.sk)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  /** Q22 shape — wealthy LAPSED customers: account balance above the
    * positive-balance average (an uncorrelated scalar subquery — the
    * 1-row broadcast gate) and no orders since 1998 (NOT EXISTS over a
    * filtered orders scan → left anti), counted per market segment.
    * Every fixture customer has SOME order, so the classic
    * never-ordered form is empty at all SFs — the recency cutoff keeps
    * the identical anti-join shape with live rows (3 customers at
    * sf0.01, 30 at sf0.1). The average is the exact-decimal-sum /
    * count double quotient, so the > comparison is bit-identical
    * across engines.
    */
  def q22IdleRich(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val avgBal = c.filter(col("c_acctbal") > 0.0)
      .agg(Exact.davg(col("c_acctbal")).as("avg_bal"))
    val recent = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
    c.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"),
        Exact.dsum(col("c_acctbal"), 2).as("totacctbal"))
      .orderBy("c_mktsegment")
  }

  val q22Sql: String =
    """SELECT c_mktsegment, count(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS totacctbal
      |FROM customer c
      |WHERE c_acctbal > (
      |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) / COUNT(c_acctbal)
      |    FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c.c_custkey
      |                    AND o_orderdate >= TIMESTAMP '1998-01-01')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Q12 shape — shipping classes vs order priority: lineitems shipped
    * in 1996, grouped by a low-cardinality lineitem attribute, counting
    * critical-priority orders against the rest. The fixture has no
    * l_shipmode column, so l_returnflag carries the grouping role; the
    * plan shape is Q12's — the date filter prunes the fact scan, one
    * shuffle join on the order key, then a tiny conditional-count
    * aggregate. The CASE branches are evaluated inside the joined
    * stream (whole-stage codegen), never as separate passes.
    */
  def q12Priority(s: SparkSession, dir: String): DataFrame = {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  val q12Sql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Q13 shape — customer order-count distribution: how many customers
    * placed exactly k qualifying orders, INCLUDING the zero bucket. The
    * left-outer join is the load-bearing part (an inner join silently
    * drops the never-ordered customers); the qualifying filter lives on
    * the orders side BEFORE the join — the outer-join ON-clause
    * semantics of the classic form. Two keyed hash aggregates, the
    * second over at most a few dozen distinct counts.
    */
  def q13CustDist(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
    Tables.customer(s, dir)
      .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13Sql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders
      |        ON c_custkey = o_custkey
      |        AND o_orderpriority <> '4-NOT SPECIFIED'
      |      GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Q17 shape — small-quantity-order revenue: average yearly revenue
    * lost if orders below 20% of a part's average quantity were not
    * taken. The classic plan (and the naive agg-then-rejoin form)
    * scans the fact TWICE — once for the per-part average, once for
    * the probe; here the correlated AVG subquery is a keyed WINDOW
    * over the already-joined stream, so the fact is scanned ONCE and
    * shuffled once on the part key (every lineitem of a qualifying
    * part is in the join, so the per-part average over the join equals
    * the classic per-part average over all of lineitem — at 100 TB
    * that one saved scan is the query's dominant cost). The threshold
    * average is the exact-decimal-sum / count double quotient, so the
    * `<` comparison is bit-identical across engines. part's two
    * filters prune its broadcast side to a handful of rows.
    */
  def q17SmallQty(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = Tables.part(s, dir)
      .filter(col("p_brand") === "Brand#5" && col("p_type") === "SMALL")
      .select(col("p_partkey"))
    val w = Window.partitionBy(col("l_partkey"))
    Tables.lineitem(s, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .withColumn("qty_cap",
        lit(0.2) * (sum(col("l_quantity").cast("decimal(28,6)")).over(w)
          .cast("double") / count(col("l_quantity")).over(w)))
      .filter(col("l_quantity") < col("qty_cap"))
      .agg((Exact.dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
  }

  val q17Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / 7.0
      |    AS avg_yearly
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand = 'Brand#5' AND p_type = 'SMALL'
      |  AND l_quantity < (
      |    SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(28,6))) AS DOUBLE)
      |                  / COUNT(l2.l_quantity))
      |    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)""".stripMargin

  // --- derived partsupp + the four partsupp-gated TPC-H families -----------
  // The fixture set ships no partsupp table, so the four classic queries
  // that need one (Q2/Q11/Q16/Q20) are served over a DETERMINISTIC VIEW
  // derived from part × supplier-count: each part gets exactly four
  // suppliers at stride s_cnt/4 (distinct mod s_cnt for any s_cnt ≥ 4),
  // and availqty/supplycost are hash-like integer arithmetic on the pair
  // key — engine-portable (BIGINT ops + an exact 1/64 binary fraction for
  // the cost, the same discipline as x6_mixture), so Spark and the DuckDB
  // oracle materialize the identical table from the identical inputs.
  // At 100 TB the view is a generator-projection over part (no join, no
  // shuffle): 4× part rows, still dimension-sized next to the fact.

  /** The derived partsupp view: (ps_partkey, ps_suppkey) unique, four
    * suppliers per part. `explode` is a generator — partsupp never
    * shuffles and never cross-joins; the one auxiliary input is the
    * 1-row supplier count (broadcast gate idiom).
    */
  /** (n_nationkey, n_name) of one region's nations, broadcast-sized —
    * the region-qualification block q2/q8/q11/q20 all share (it was
    * previously copy-pasted per query).
    */
  private def regionNations(s: SparkSession, dir: String, region: String): DataFrame =
    Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))

  private[graft] def partsupp(s: SparkSession, dir: String): DataFrame = {
    val scnt = Tables.supplier(s, dir).agg(count(lit(1)).as("s_cnt"))
    Tables.part(s, dir).select(col("p_partkey"))
      .crossJoin(broadcast(scnt))
      .select(col("p_partkey"), col("s_cnt"),
        explode(array((0 to 3).map(lit): _*)).as("i"))
      .withColumn("ps_suppkey",
        (col("p_partkey") + col("i") * expr("s_cnt div 4")) % col("s_cnt"))
      .select(
        col("p_partkey").as("ps_partkey"),
        col("ps_suppkey"),
        (((col("p_partkey") * 37 + col("ps_suppkey") * 11) % 9999) + 1)
          .cast("int").as("ps_availqty"),
        (((col("p_partkey") * 13 + col("ps_suppkey") * 101) % 6400)
          .cast("double") / 64.0 + 1.0).as("ps_supplycost"))
  }

  /** The identical view as a SQL CTE prefix for the DuckDB twins.
    * DuckDB's `/` on integers is double division, so the stride uses
    * `//`; Spark's side uses `div`. Both are floor division on
    * non-negative operands.
    */
  private val psSql: String =
    """WITH scnt AS (SELECT count(*) AS s_cnt FROM supplier),
      |partsupp AS (
      |  SELECT p_partkey AS ps_partkey,
      |    (p_partkey + v.i * (s_cnt // 4)) % s_cnt AS ps_suppkey,
      |    CAST(((p_partkey * 37 + ((p_partkey + v.i * (s_cnt // 4)) % s_cnt) * 11) % 9999) + 1
      |      AS INTEGER) AS ps_availqty,
      |    CAST((p_partkey * 13 + ((p_partkey + v.i * (s_cnt // 4)) % s_cnt) * 101) % 6400
      |      AS DOUBLE) / 64.0 + 1.0 AS ps_supplycost
      |  FROM part CROSS JOIN scnt CROSS JOIN (VALUES (0),(1),(2),(3)) v(i))""".stripMargin

  /** Q2 shape — min-cost supplier: for LARGE mid-size parts, the
    * EUROPE supplier(s) offering each part at the region-minimum
    * supply cost. The classic form scans partsupp TWICE (outer + the
    * correlated min); here the correlated min is a keyed WINDOW over
    * the single region-qualified join (the Q17 single-scan discipline
    * — the window partition is the correlation key, and the window
    * frame IS the subquery's domain because the eligibility filters
    * are per-part, never per-supplier). supplycost is an exact binary
    * fraction, so the min and the equality are bit-identical across
    * engines.
    */
  def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = Tables.part(s, dir)
      .filter(col("p_type") === "LARGE" && col("p_size").between(10, 20))
      .select(col("p_partkey"), col("p_name"))
    val eur = regionNations(s, dir, "EUROPE")
    val w = Window.partitionBy(col("ps_partkey"))
    partsupp(s, dir)
      .join(broadcast(p), col("ps_partkey") === col("p_partkey"))
      .join(Tables.supplier(s, dir), col("ps_suppkey") === col("s_suppkey"))
      .join(broadcast(eur), col("s_nationkey") === col("n_nationkey"))
      .withColumn("min_cost", min(col("ps_supplycost")).over(w))
      .filter(col("ps_supplycost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("ps_supplycost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  val q2Sql: String = psSql +
    """
      |, eligible AS (
      |  SELECT p_partkey, p_name, ps_supplycost, s_name, s_acctbal, n_name
      |  FROM partsupp
      |  JOIN part ON p_partkey = ps_partkey
      |  JOIN supplier ON s_suppkey = ps_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE' AND p_type = 'LARGE' AND p_size BETWEEN 10 AND 20)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost
      |FROM eligible e
      |WHERE ps_supplycost = (SELECT min(ps_supplycost) FROM eligible e2
      |                       WHERE e2.p_partkey = e.p_partkey)
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin

  /** Q11 shape — important stock: parts whose EUROPE-held inventory
    * value exceeds 1.5× the average per-part value. One keyed hash
    * aggregate builds the per-part values; the threshold is a 1-row
    * broadcast gate over THAT grouped frame (never a second partsupp
    * scan). Value sums are exact decimal; the threshold divides in
    * double on both engines.
    */
  def q11ImportantStock(s: SparkSession, dir: String): DataFrame = {
    val eur = regionNations(s, dir, "EUROPE").select(col("n_nationkey"))
    val vals = partsupp(s, dir)
      .join(Tables.supplier(s, dir), col("ps_suppkey") === col("s_suppkey"))
      .join(broadcast(eur), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("ps_partkey"))
      .agg(Exact.dsum(col("ps_supplycost") * col("ps_availqty")).as("value"))
    val thr = vals.agg((lit(1.5) * Exact.dsum(col("value")) / count(lit(1))).as("thr"))
    vals.crossJoin(broadcast(thr))
      .filter(col("value") > col("thr"))
      .select(col("ps_partkey"), col("value"))
      .orderBy(col("value").desc, col("ps_partkey"))
  }

  val q11Sql: String = psSql +
    """
      |, vals AS (
      |  SELECT ps_partkey,
      |    CAST(SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(28,6))) AS DOUBLE) AS value
      |  FROM partsupp
      |  JOIN supplier ON ps_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'
      |  GROUP BY ps_partkey)
      |SELECT ps_partkey, value FROM vals
      |WHERE value > (SELECT 1.5 * CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / count(*)
      |               FROM vals)
      |ORDER BY value DESC, ps_partkey""".stripMargin

  /** Q16 shape — supplier diversity per part attribute: how many
    * distinct non-distressed suppliers stock each surviving
    * (brand, type, size) combination. The classic NOT IN over a
    * supplier predicate is a broadcast anti join (s_suppkey is
    * non-null, so NOT IN ≡ anti); part's three filters prune its
    * broadcast side before the join; one countDistinct aggregate.
    */
  def q16SupplierCnt(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35, 40))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val distressed = Tables.supplier(s, dir)
      .filter(col("s_acctbal") < 0.0).select(col("s_suppkey"))
    partsupp(s, dir)
      .join(broadcast(p), col("ps_partkey") === col("p_partkey"))
      .join(broadcast(distressed), col("ps_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val q16Sql: String = psSql +
    """
      |SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
      |FROM partsupp JOIN part ON p_partkey = ps_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40)
      |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** Q20 shape — suppliers with surplus stock of red parts: EUROPE
    * suppliers holding more than half a year's shipments (1996) of any
    * red part they stock. The classic nested form correlates a
    * lineitem SUM per (partkey, suppkey) inside an IN inside an IN;
    * here the fact is aggregated ONCE keyed by the pair and joined —
    * no per-row rescans (the Q17 discipline at a composite key). The
    * inner join reproduces the classic NULL semantics exactly: a pair
    * with no 1996 shipments has a NULL correlated sum, and
    * `availqty > NULL` excludes the row. Quantity sums are exact
    * decimal on both engines, so the strict `>` agrees bitwise.
    */
  def q20PromoPartSupp(s: SparkSession, dir: String): DataFrame = {
    val redParts = Tables.part(s, dir)
      .filter(col("p_name").like("red%")).select(col("p_partkey"))
    val shipped = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(Exact.dsum(col("l_quantity")).as("qty"))
    val eur = regionNations(s, dir, "EUROPE").select(col("n_nationkey"))
    val qualified = partsupp(s, dir)
      .join(broadcast(redParts), col("ps_partkey") === col("p_partkey"), "left_semi")
      .join(shipped, col("ps_partkey") === col("l_partkey") &&
        col("ps_suppkey") === col("l_suppkey"))
      .filter(col("ps_availqty") > lit(0.5) * col("qty"))
      .select(col("ps_suppkey")).distinct()
    Tables.supplier(s, dir)
      .join(broadcast(qualified), col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .join(broadcast(eur), col("s_nationkey") === col("n_nationkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name"))
  }

  val q20Sql: String = psSql +
    """
      |SELECT s_name, s_acctbal FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'EUROPE' AND s_suppkey IN (
      |  SELECT ps_suppkey FROM partsupp
      |  WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      |    AND ps_availqty > 0.5 * (
      |      SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) FROM lineitem
      |      WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
      |        AND l_shipdate >= TIMESTAMP '1996-01-01'
      |        AND l_shipdate < TIMESTAMP '1997-01-01'))
      |ORDER BY s_name""".stripMargin

  // --- event-stream analytics (A5–A7 [EXT]) ---------------------------------
  // The reference's events are opaque Kafka payloads counted in aggregate
  // (dags/kafka_to_mongo_pipeline.py:56-62); these are the product-analytics
  // shapes an engine user runs on the same stream once it is a table.

  private def events(s: SparkSession, dir: String) =
    Tables.events(s, dir).select(col("user_id"), col("event_type"), col("ts"))

  /** A5 — ordered funnel: signup → click (within 12 h) → purchase (within
    * 24 h of the click), each stage's event strictly after the user's
    * previous stage time. Every stage is one hash aggregate on user_id
    * followed by a join back on user_id — the stage frames shrink
    * monotonically and are co-keyed, so at 100 TB the three shuffles share
    * a partitioning and the later joins broadcast. Driver-side there is
    * ONE row per stage — counts move, events don't.
    */
  def a5Funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    // s1 feeds THREE consumers (s2's join, its stage count, the
    // conversion denominator) and s2 two — Catalyst does not dedupe
    // common subplans, so uncached each consumer re-scans the fact and
    // re-runs the stage aggregate. Cache growth is bounded by the
    // CacheManager's plan-dedup (the bandedCorpus note).
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      .transform(Caches.scoped)
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id")
      .filter(col("ts") > col("t1") && col("ts") <= col("t1") + expr("INTERVAL 12 HOURS"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      .transform(Caches.scoped)
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id")
      .filter(col("ts") > col("t2") && col("ts") <= col("t2") + expr("INTERVAL 24 HOURS"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val counts = s1.agg(count(lit(1)).as("n_users")).withColumn("stage", lit("1_signup"))
      .unionByName(s2.agg(count(lit(1)).as("n_users")).withColumn("stage", lit("2_click")))
      .unionByName(s3.agg(count(lit(1)).as("n_users")).withColumn("stage", lit("3_purchase")))
    val entered = s1.agg(count(lit(1)).as("n_entered"))
    counts.crossJoin(entered)
      .select(col("stage"), col("n_users"),
        round(col("n_users").cast("double") / col("n_entered"), 6).as("conversion"))
      .orderBy("stage")
  }

  val a5FunnelSql: String =
    """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
      |            WHERE event_type = 'signup' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
      |       WHERE event_type = 'click' AND ts > t1
      |         AND ts <= t1 + INTERVAL 12 HOUR GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, min(ts) AS t3 FROM events e JOIN s2 USING (user_id)
      |       WHERE event_type = 'purchase' AND ts > t2
      |         AND ts <= t2 + INTERVAL 24 HOUR GROUP BY e.user_id),
      |counts AS (
      |  SELECT '1_signup' AS stage, count(*) AS n_users FROM s1
      |  UNION ALL SELECT '2_click', count(*) FROM s2
      |  UNION ALL SELECT '3_purchase', count(*) FROM s3)
      |SELECT stage, CAST(n_users AS BIGINT) AS n_users,
      |  round(n_users * 1.0 / (SELECT count(*) FROM s1), 6) AS conversion
      |FROM counts ORDER BY stage""".stripMargin

  /** A6 — weekly cohort retention: users grouped by the ISO week of their
    * first signup; a cohort-week cell counts distinct users active (any
    * event) in week `cohort + offset`. The first-touch frame is one hash
    * aggregate keyed by user_id; activity re-joins on the same key, then
    * the distinct+count is keyed by (cohort, offset) — small output, no
    * driver loops. Both engines truncate weeks to ISO Monday.
    */
  def a6Retention(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val first = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort_week"))
    ev.join(first, "user_id")
      .select(col("user_id"), col("cohort_week"),
        (datediff(date_trunc("week", col("ts")).cast("date"), col("cohort_week")) / 7)
          .cast("int").as("week_offset"))
      .filter(col("week_offset") >= 0)
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort_week", "week_offset")
  }

  val a6RetentionSql: String =
    """WITH first_touch AS (
      |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id)
      |SELECT cohort_week, week_offset, count(*) AS n_active FROM (
      |  SELECT DISTINCT e.user_id, f.cohort_week,
      |    CAST((CAST(date_trunc('week', e.ts) AS DATE) - f.cohort_week) / 7 AS INTEGER)
      |      AS week_offset
      |  FROM events e JOIN first_touch f USING (user_id)
      |  WHERE CAST(date_trunc('week', e.ts) AS DATE) >= f.cohort_week)
      |GROUP BY cohort_week, week_offset ORDER BY cohort_week, week_offset""".stripMargin

  /** A7 — daily-total anomaly detection: z-score of each (event_type, day)
    * revenue against that type's month, flagging |z| ≥ 1.5. Mean and
    * variance come from exact decimal sums of the daily totals
    * (Σx, Σx² — one extra agg, no second pass over raw events), so the
    * z-scores are bit-identical across engines and partition orders; the
    * naive stddev-over-window form would depend on float summation order.
    * Two keyed hash aggregates + a broadcast join of per-type stats.
    */
  def a7Anomaly(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(Exact.dsum(col("value")).as("daily"))
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        Exact.dsum(col("daily")).as("sx"),
        Exact.dsum(col("daily") * col("daily")).as("sxx"))
      .select(col("event_type"), col("n"), col("sx"), col("sxx"),
        (col("sx") / col("n")).as("mean"),
        sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)).as("sd"))
    daily.join(broadcast(stats), "event_type")
      .select(col("event_type"), col("day"), round(col("daily"), 2).as("daily"),
        round((col("daily") - col("mean")) / col("sd"), 4).as("z"))
      .filter(abs(col("z")) >= 1.5)
      .orderBy("event_type", "day")
  }

  val a7AnomalySql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS daily
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(SUM(CAST(daily AS DECIMAL(28,6))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(daily * daily AS DECIMAL(28,6))) AS DOUBLE) AS sxx
      |  FROM daily GROUP BY 1)
      |SELECT event_type, day, round(daily, 2) AS daily,
      |  round((daily - sx / n) / sqrt((sxx - sx * sx / n) / (n - 1)), 4) AS z
      |FROM daily JOIN stats USING (event_type)
      |WHERE abs(round((daily - sx / n) / sqrt((sxx - sx * sx / n) / (n - 1)), 4)) >= 1.5
      |ORDER BY event_type, day""".stripMargin
}
