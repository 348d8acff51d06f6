package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Reference-parity pipeline operators (SURVEY.md §2.2–2.5): the dataflow
  * surface of the Airflow DAGs re-expressed as lazy DataFrame plans.
  *
  * Fixtures contain no NULLs (FIXTURES.md), so the null-dependent ops
  * (P1/P2, ref dags/etl_data_pipeline.py:23 and
  * dags/etl_data_pipeline_mongodb_complex.py:40) first derive nullable
  * columns with `when(...)` — the drop semantics themselves are also
  * unit-tested on frames with real nulls.
  *
  * Determinism discipline for the DuckDB oracle: every query is totally
  * ordered on a non-null unique key (SURVEY.md N4); raw `events.ts` is
  * never emitted (ns-vs-us parquet precision, FIXTURES.md caveats).
  */
object Pipeline {

  /** P1 — pandas `dropna()` (drop row if ANY column null).
    * Ref: dags/etl_data_pipeline.py:23.
    */
  def p1DropnaAny(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .withColumn("c_acctbal", when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")))
      .na.drop("any")
      .orderBy("c_custkey")

  val p1Sql: String =
    "SELECT * FROM customer WHERE c_acctbal >= 0 ORDER BY c_custkey"

  /** P2 — pandas `dropna(how='all')` (drop row only if ALL columns null).
    * Ref: dags/etl_data_pipeline_mongodb_complex.py:40.
    */
  def p2DropnaAll(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        when(col("o_orderstatus") === "F", col("o_totalprice")).as("f_price"),
        when(col("o_orderstatus") === "O", col("o_totalprice")).as("open_price"))
      .na.drop("all", Seq("f_price", "open_price"))
      .orderBy("o_orderkey")

  val p2Sql: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS f_price,
      |  CASE WHEN o_orderstatus = 'O' THEN o_totalprice END AS open_price
      |FROM orders WHERE o_orderstatus IN ('F','O') ORDER BY o_orderkey""".stripMargin

  /** P3 — required-keys validation filter over JSON payloads (absent key ⇒
    * null after extraction). Ref: dags/kafka_to_mongo_pipeline_enchanced.py:31-42.
    */
  def p3Validate(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(get_json_object(col("props"), "$.k").isNotNull
        && col("event_type").isNotNull && col("user_id").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy("event_id")

  val p3Sql: String =
    """SELECT event_id, user_id, event_type,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      |FROM events
      |WHERE json_extract_string(props, '$.k') IS NOT NULL
      |  AND event_type IS NOT NULL AND user_id IS NOT NULL
      |ORDER BY event_id""".stripMargin

  /** P4 — uppercase projection. Ref: dags/kafka_to_mongo_pipeline.py:76. */
  def p4Upper(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"), upper(col("p_type")).as("title"))
      .orderBy("p_partkey")

  val p4Sql: String =
    "SELECT p_partkey, upper(p_type) AS title FROM part ORDER BY p_partkey"

  /** P5 — enrichment projection: literal source/status + derived date
    * (deterministic stand-in for wall-clock `processed_timestamp`,
    * SURVEY.md N6). Ref: dags/kafka_to_mongo_pipeline_enchanced.py:65-80.
    */
  def p5Enrich(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        lit("jsonplaceholder_api").as("source"),
        lit("raw").as("data_status"),
        to_date(col("o_orderdate")).as("processed_date"))
      .orderBy("o_orderkey")

  val p5Sql: String =
    """SELECT o_orderkey, 'jsonplaceholder_api' AS source, 'raw' AS data_status,
      |  CAST(o_orderdate AS DATE) AS processed_date
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** P6 — bytes→string envelope projection (binary Kafka value decoded and
    * wrapped). Ref: dags/kafka_to_mongo.py:18.
    */
  def p6Envelope(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"),
        decode(encode(col("p_name"), "UTF-8"), "UTF-8").as("message"))
      .orderBy("p_partkey")

  val p6Sql: String =
    "SELECT p_partkey, p_name AS message FROM part ORDER BY p_partkey"

  /** P7 — tag + 1-based index projection over two "scraped" record kinds,
    * unioned. Ref: dags/scrap_to_kafka_to_mongo_pipeline.py:57-68 — the
    * reference enumerates items WITHIN one scraped page, so the faithful
    * (and scale-safe) form is a per-page index: the window partitions by
    * page (here synthesized as `p_partkey div 100` — each fixture "page"
    * contributes 100 titles), never coalescing to a single partition.
    * The reference's exact single-page shape is [[p7TagIndexGlobal]],
    * unit-tested for parity on one-page data.
    */
  def p7TagIndex(s: SparkSession, dir: String): DataFrame = {
    val titles = Tables.part(s, dir)
      .select(lit("title").as("type"),
        expr("p_partkey div 100").as("page"),
        row_number().over(
          Window.partitionBy(expr("p_partkey div 100")).orderBy(col("p_partkey"))).as("index"),
        col("p_name").as("content"))
    val links = Tables.region(s, dir)
      .select(lit("link").as("type"),
        expr("r_regionkey div 100").as("page"),
        row_number().over(
          Window.partitionBy(expr("r_regionkey div 100")).orderBy(col("r_regionkey"))).as("index"),
        col("r_name").as("content"))
    titles.unionByName(links).orderBy(col("type"), col("page"), col("index"))
  }

  val p7Sql: String =
    """SELECT * FROM (
      |  SELECT 'title' AS type, p_partkey // 100 AS page,
      |    CAST(row_number() OVER (PARTITION BY p_partkey // 100 ORDER BY p_partkey) AS INTEGER) AS index,
      |    p_name AS content FROM part
      |  UNION ALL
      |  SELECT 'link' AS type, r_regionkey // 100 AS page,
      |    CAST(row_number() OVER (PARTITION BY r_regionkey // 100 ORDER BY r_regionkey) AS INTEGER) AS index,
      |    r_name AS content FROM region
      |) ORDER BY type, page, index""".stripMargin

  /** The reference's literal single-page shape: one global 1-based index
    * per type. A partition-less window coalesces to a single partition,
    * so this is a parity alias for one-page inputs only — the queried
    * form is the per-page [[p7TagIndex]].
    */
  def p7TagIndexGlobal(s: SparkSession, dir: String): DataFrame = {
    val titles = Tables.part(s, dir)
      .select(lit("title").as("type"),
        row_number().over(Window.orderBy(col("p_partkey"))).as("index"),
        col("p_name").as("content"))
    val links = Tables.region(s, dir)
      .select(lit("link").as("type"),
        row_number().over(Window.orderBy(col("r_regionkey"))).as("index"),
        col("r_name").as("content"))
    titles.unionByName(links).orderBy(col("type"), col("index"))
  }

  /** P8 — whitespace-strip scalar. Ref: dags/scrap_to_kafka_to_mongo_pipeline.py:59.
    * Bare `trim()` strips ONLY spaces (0x20) in Spark and DuckDB alike —
    * the referenced Python `.strip()` removes tabs/newlines too, so both
    * twins trim the explicit whitespace SET (they'd otherwise agree with
    * each other while both keeping a trailing tab the reference strips).
    */
  def p8Trim(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey"),
        trim(concat(lit("  "), col("c_name"), lit("\t ")), " \t\n\r").as("name"))
      .orderBy("c_custkey")

  val p8Sql: String =
    """SELECT c_custkey,
      |  trim(concat('  ', c_name, chr(9), ' '),
      |       concat(' ', chr(9), chr(10), chr(13))) AS name
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** P9 — record→JSON-string serialization (Kafka producer value shape).
    * Ref: dags/kafka_to_mongo_pipeline.py:41, producer.py:8.
    */
  def p9ToJson(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir)
      .select(col("n_nationkey"),
        to_json(struct(col("n_nationkey"), col("n_name"))).as("payload"))
      .orderBy("n_nationkey")

  val p9Sql: String =
    """SELECT n_nationkey,
      |  CAST(to_json(struct_pack(n_nationkey := n_nationkey, n_name := n_name)) AS VARCHAR) AS payload
      |FROM nation ORDER BY n_nationkey""".stripMargin

  /** P10 — JSON-string→record deserialization.
    * Ref: dags/kafka_to_mongo_pipeline.py:59, consumer.py:17.
    */
  def p10FromJson(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", IntegerType)))
    Tables.events(s, dir)
      .select(col("event_id"), from_json(col("props"), schema).getField("k").as("k"))
      .orderBy("event_id")
  }

  val p10Sql: String =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      |FROM events ORDER BY event_id""".stripMargin

  /** P11 — preview/head, made deterministic with a total order (N4).
    * Ref: dags/etl_data_pipeline.py:20.
    */
  def p11Head(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(5)

  val p11Sql: String =
    "SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 5"

  /** U1 — union-by-name with null fill across mismatched schemas (pandas
    * outer concat). Ref: dags/etl_data_pipeline_mongodb_complex.py:28-33;
    * semantics note SURVEY.md N2.
    */
  def u1UnionByName(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.customer(s, dir).select(
      col("c_custkey").as("id"), col("c_name").as("name"),
      col("c_acctbal").as("acctbal"), col("c_mktsegment").as("segment"))
    val b = Tables.supplier(s, dir).select(
      col("s_suppkey").as("id"), col("s_name").as("name"),
      col("s_nationkey").cast("int").as("nationkey"))
    a.unionByName(b, allowMissingColumns = true).orderBy("name")
  }

  val u1Sql: String =
    """SELECT * FROM (
      |  SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal, c_mktsegment AS segment FROM customer
      |  UNION ALL BY NAME
      |  SELECT s_suppkey AS id, s_name AS name, CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier
      |) ORDER BY name""".stripMargin

  /** A1 — row count surfaced as a result (XCom stand-in).
    * Ref: dags/etl_data_pipeline_mongodb_complex.py:43.
    */
  def a1Count(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).agg(count(lit(1)).as("nb_lignes"))

  val a1Sql: String = "SELECT COUNT(*) AS nb_lignes FROM lineitem"

  /** A2 — threshold branch: emit the cleaned rows only when the cleaned
    * count exceeds 10, declaratively (broadcast one-row count, no driver
    * round-trip — survives any scale).
    * Ref: dags/etl_data_pipeline_mongodb_complex.py:57-62.
    */
  def a2Branch(s: SparkSession, dir: String): DataFrame = {
    val cleaned = Tables.customer(s, dir).filter(col("c_acctbal") > 9000)
    val n = cleaned.agg(count(lit(1)).as("gate_n"))
    cleaned.crossJoin(broadcast(n)).filter(col("gate_n") > 10).drop("gate_n")
      .orderBy("c_custkey")
  }

  val a2Sql: String =
    """WITH cleaned AS (SELECT * FROM customer WHERE c_acctbal > 9000)
      |SELECT * FROM cleaned WHERE (SELECT COUNT(*) FROM cleaned) > 10
      |ORDER BY c_custkey""".stripMargin

  /** A4 [EXT] — dead-letter routing: ONE validation pass splits a frame
    * into (valid, rejected-with-reasons). Nothing is silently dropped —
    * the reject side carries a comma-joined reason list, the production
    * alternative to the reference's log-and-discard validation
    * (dags/kafka_to_mongo_pipeline_enchanced.py:31-42). Both outputs are
    * lazy projections of the same scan: writing valid → main and dlq →
    * quarantine costs one pass, not two.
    */
  def dlqSplit(df: DataFrame, checks: Seq[(String, org.apache.spark.sql.Column)])
      : (DataFrame, DataFrame) = {
    val reasons = array_compact(array(
      checks.map { case (name, bad) => when(bad, lit(name)) }: _*))
    val tagged = df.withColumn("__reasons", reasons)
    (tagged.filter(size(col("__reasons")) === 0).drop("__reasons"),
      tagged.filter(size(col("__reasons")) > 0)
        .withColumn("dlq_reason", concat_ws(",", col("__reasons")))
        .drop("__reasons"))
  }

  /** A4 as a driver-checked query: route customers through two business
    * rules and count each routing outcome (multi-reason rows exercise
    * the reason concatenation).
    */
  def a4DlqRouting(s: SparkSession, dir: String): DataFrame = {
    val (valid, dlq) = dlqSplit(Tables.customer(s, dir), Seq(
      "negative_balance" -> (col("c_acctbal") < 0),
      "invalid_nation" -> (col("c_nationkey") >= 20)))
    valid.select(lit("valid").as("status"))
      .unionByName(dlq.select(col("dlq_reason").as("status")))
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
      .orderBy("status")
  }

  val a4Sql: String =
    """SELECT status, count(*) AS n FROM (
      |  SELECT CASE WHEN reasons = '' THEN 'valid' ELSE reasons END AS status FROM (
      |    SELECT concat_ws(',',
      |      CASE WHEN c_acctbal < 0 THEN 'negative_balance' END,
      |      CASE WHEN c_nationkey >= 20 THEN 'invalid_nation' END) AS reasons
      |    FROM customer))
      |GROUP BY status ORDER BY status""".stripMargin

  /** L5/T5/N3 — keyed upsert as a query: last-write-wins per user_id in
    * event_id (offset) order. Ref: dags/kafka_to_mongo_pipeline_enchanced.py:141-145.
    * Scales: one hash shuffle on the key, state bounded by key cardinality.
    */
  def l5Upsert(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .orderBy("user_id")
  }

  val l5Sql: String =
    """SELECT event_id, user_id, event_type, value FROM (
      |  SELECT event_id, user_id, event_type, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      |  FROM events
      |) WHERE rn = 1 ORDER BY user_id""".stripMargin
}
