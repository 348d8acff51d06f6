package graft.sources

import java.io.{BufferedInputStream, FileOutputStream}
import java.net.URL
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion surface (SURVEY.md §2.1 S1–S9).
  *
  * S1/S2's HTTP download is a driver-side landing step (the engine proper
  * starts at the landed file, exactly like the reference's
  * `/tmp/data.csv` handoff — dags/etl_data_pipeline.py:9-14); everything
  * after it is a distributed scan.
  */
object Sources {

  /** S1/S2 — fetch a URL to a local landing file with bounded retries
    * (ref: fetch_data_with_retry, dags/kafka_to_mongo_pipeline_enchanced.py:44-63).
    * Works with file:// URLs in the offline harness; java.net handles
    * http(s) identically in a connected deployment.
    */
  def fetchToFile(url: String, dest: String, maxRetries: Int = 3): Unit = {
    var attempt = 0
    var ok = false
    var last: Throwable = null
    while (!ok && attempt < maxRetries) {
      attempt += 1
      try {
        val in = new BufferedInputStream(new URL(url).openStream())
        try {
          Files.createDirectories(Paths.get(dest).getParent)
          val out = new FileOutputStream(dest)
          try in.transferTo(out) finally out.close()
          ok = true
        } finally in.close()
      } catch {
        // NonFatal only: an interrupt or VM error must propagate, not be
        // silently retried. Transient failures back off linearly (the
        // reference's fetch_data_with_retry sleeps between attempts) so a
        // brief server blip doesn't exhaust every retry back-to-back.
        case scala.util.control.NonFatal(t) =>
          last = t
          if (attempt < maxRetries) Thread.sleep(100L * attempt)
      }
    }
    if (!ok) throw new RuntimeException(s"fetch failed after $maxRetries attempts: $url", last)
  }

  /** S3 — CSV scan with header + schema inference
    * (ref: pd.read_csv, dags/etl_data_pipeline.py:18). At 100 TB scale
    * pass an explicit schema instead — inference reads the data twice.
    */
  def readCsv(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schema match {
      case Some(sc) => r.schema(sc).csv(path)
      case None => r.option("inferSchema", "true").csv(path)
    }
  }

  /** S4 — JSON-records scan (ref: pd.read_json, dags/etl_data_pipeline_mongodb.py:35).
    *
    * Default is JSON-lines (one record per line) — the splittable,
    * partition-parallel form every 100 TB pipeline lands. Pass
    * `multiLine = true` only for pandas-style whole-file arrays: that
    * mode reads each FILE as one JSON document (non-splittable, and it
    * silently truncates JSON-lines input to its first record).
    */
  def readJsonRecords(spark: SparkSession, path: String, schema: Option[StructType] = None,
                      multiLine: Boolean = false): DataFrame = {
    val r = spark.read.option("multiLine", multiLine.toString)
    schema match {
      case Some(sc) => r.schema(sc).json(path)
      case None => r.json(path)
    }
  }

  /** S1/S2 as a driver-checked query: the full fetch path under the
    * oracle gate. The "API response" is a JSON-lines body staged by the
    * engine's own sink; [[fetchToFile]] lands it through the URL/retry
    * code path (file:// here — java.net serves http(s) through the
    * identical code in a connected deployment), and the landed file is
    * scanned back with an explicit schema and compared to the
    * parquet-side twin.
    */
  def s1HttpScan(s: SparkSession, dir: String): DataFrame = {
    val tmp = landingRoot
    val staged = s"$tmp/graft-api-stage"
    Sinks.writeJsonRecords(graft.engine.Tables.nation(s, dir).coalesce(1), staged)
    val part = new java.io.File(staged).listFiles
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".json")).head
    val landed = s"$tmp/graft-api-landed/data.json"
    fetchToFile("file://" + part.getAbsolutePath, landed)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    readJsonRecords(s, landed, Some(schema))
      .orderBy("n_nationkey")
  }

  val s1HttpScanSql: String =
    "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"

  /** S3 as a driver-checked query: land the customer table as CSV (the
    * reference's `/tmp/data.csv` handoff, dags/etl_data_pipeline.py:9-18),
    * scan it back with [[readCsv]] and an explicit schema (the 100 TB
    * form — inference reads the data twice), filter, and project. The
    * oracle runs against the parquet-side table, so the whole CSV
    * write→scan→transform path sits under the correctness gate.
    */
  def s3CsvScan(s: SparkSession, dir: String): DataFrame = {
    val landing = s"$landingRoot/graft-landing-csv"
    Sinks.writeCsv(graft.engine.Tables.customer(s, dir), landing)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    readCsv(s, landing, Some(schema))
      .filter(col("c_acctbal") > 5000.0)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  val s3CsvScanSql: String =
    """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      |FROM customer WHERE c_acctbal > 5000.0 ORDER BY c_custkey""".stripMargin

  /** S4 as a driver-checked query: land orders as JSON records, scan back
    * with [[readJsonRecords]] + explicit schema (ref: pd.read_json,
    * dags/etl_data_pipeline_mongodb.py:35), filter, project — the JSON
    * write→scan path under the correctness gate, timestamps included.
    */
  def s4JsonScan(s: SparkSession, dir: String): DataFrame = {
    val landing = s"$landingRoot/graft-landing-json"
    Sinks.writeJsonRecords(graft.engine.Tables.orders(s, dir), landing)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType)))
    readJsonRecords(s, landing, Some(schema))
      .filter(col("o_totalprice") > 1000.0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"))
      .orderBy("o_orderkey")
  }

  val s4JsonScanSql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
      |FROM orders WHERE o_totalprice > 1000.0 ORDER BY o_orderkey""".stripMargin

  /** Per-process landing ROOT for every staged-scan query (S1/S3/S4/S10):
    * a fixed shared path (the old `$tmpdir/graft-landing-*`) would let two
    * concurrent runs — Verify and Bench on the same box — overwrite each
    * other's landing mid-scan; one process's repeated calls overwrite
    * sequentially, which is safe and keeps the queries idempotent.
    */
  private lazy val landingRoot: String =
    Files.createTempDirectory("graft-landing").toString

  /** S10 [EXT] — ORC scan. ORC is self-describing (schema in the footer,
    * like parquet) and splittable; it is the other columnar format a
    * warehouse migration hands this engine. No schema argument: trusting
    * the footer IS the 100 TB form here, unlike CSV/JSON.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** S10 as a driver-checked query: land supplier as ORC, scan it back,
    * filter + project — the ORC write→scan path under the correctness
    * gate, with the oracle reading the parquet-side table. Timestamps and
    * doubles round-trip through ORC's own type system.
    */
  def s10OrcScan(s: SparkSession, dir: String): DataFrame = {
    val landing = s"$landingRoot/graft-landing-orc"
    Sinks.writeOrc(graft.engine.Tables.supplier(s, dir), landing)
    readOrc(s, landing)
      .filter(col("s_acctbal") > 2500.0)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
      .orderBy("s_suppkey")
  }

  val s10OrcScanSql: String =
    """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
      |FROM supplier WHERE s_acctbal > 2500.0 ORDER BY s_suppkey""".stripMargin

  /** S8 — HTML scrape: h1 texts + first 10 hrefs, tagged with a 1-based
    * index (ref: dags/scrap_to_kafka_to_mongo_pipeline.py:43-68). Pure
    * Column expressions — regexp extraction + posexplode — so it runs
    * distributed over any number of pages.
    * Input: one row per page with an `html` string column.
    */
  def scrape(pages: DataFrame): DataFrame = {
    // (?is): real HTML routinely breaks a title across lines and mixes tag
    // case — without DOTALL + case-insensitive, '<H1>' or an h1 spanning a
    // newline silently contributes NO title row (BeautifulSoup, the
    // reference scraper, matches both)
    val titles = pages
      .select(posexplode(regexp_extract_all(col("html"), lit("(?is)<h1[^>]*>(.*?)</h1>"), lit(1))).as(Seq("pos", "content")))
      .select(lit("title").as("type"), (col("pos") + 1).cast("int").as("index"),
        // whitespace SET, not bare trim: the reference's .strip() removes
        // tabs/newlines too (the p8Trim discipline)
        trim(col("content"), " \t\n\r").as("content"))
    val links = pages
      .select(posexplode(slice(regexp_extract_all(col("html"), lit("(?i)href=\"([^\"]*)\""), lit(1)), 1, 10)).as(Seq("pos", "content")))
      .select(lit("link").as("type"), (col("pos") + 1).cast("int").as("index"),
        col("content"))
    titles.unionByName(links)
  }

  /** S9 — file-existence sensor (ref: FileSensor,
    * dags/etl_data_pipeline_mongodb_complex.py:93-98). Driver-side poll;
    * the streaming-native alternative is a file-source readStream which
    * picks up files on arrival.
    */
  def waitForPath(path: String, pokeIntervalMs: Long = 10000, timeoutMs: Long = 600000): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    // poke at least ONCE whatever the timeout (the reference FileSensor
    // checks before timing out — timeoutMs=0 is "one poke, no wait"), and
    // never sleep(0)-busy-spin on a degenerate interval
    while ({
      if (Files.exists(Paths.get(path))) return true
      System.currentTimeMillis() < deadline
    }) Thread.sleep(math.max(1, math.min(pokeIntervalMs,
      math.max(1, deadline - System.currentTimeMillis()))))
    false
  }
}
