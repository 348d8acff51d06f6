package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture catalog (FIXTURES.md) with a pinned schema contract.
  *
  * Tables are driver-generated Parquet at `$dir/<name>.parquet`. Parquet is
  * self-describing, but the footers are NOT under this repo's control: a
  * driver-side writer change between rounds silently flipped `events.ts`
  * from `TIMESTAMP(NANOS, adjustedToUTC)` to `TIMESTAMP_NTZ(µs)` and took
  * out an operator with zero code churn. So every read now passes through
  * [[Tables.checked]], which asserts each column against the FIXTURES.md
  * schema and fails loudly — naming the table and column — on any future
  * drift, in ONE place instead of as a scattered analysis error.
  *
  * Event-time columns are the one family where the footer legitimately
  * varies across driver regenerations, and the correctness oracle (DuckDB)
  * reads the SAME footers directly. Hash symmetry therefore requires
  * preserving the footer's UTC-adjustedness rather than forcing one Spark
  * type: a naive/NTZ footer must stay `TimestampNTZType` (DuckDB renders
  * it `2024-01-01 12:00:00`; a forced cast to `TimestampType` would write
  * `isAdjustedToUTC` parquet that DuckDB renders `…+00:00` and every
  * ts-emitting query would hash-mismatch), while an adjusted footer reads
  * as `TimestampType` and stays that way. The nanos-as-long legacy shape
  * (read under `spark.sql.legacy.parquet.nanosAsLong=true`) is normalized
  * to microsecond `TimestampType`, matching the adjusted footers it came
  * from. Arithmetic that needs an epoch (e.g. session-gap cuts) goes
  * through [[Tables.epochUs]], which is total over both timestamp types.
  *
  * At 100 TB these reads are partition-parallel vectorized columnar scans;
  * the contract is schema-only (no data pass), and filters/projections
  * applied on top are pushed into the scan by Catalyst.
  */
object Tables {

  /** Expected shape of one fixture column. */
  private sealed trait ColSpec
  /** Must read back as exactly this Spark type. */
  private final case class Exact(dt: DataType) extends ColSpec
  /** Event-time column: footer-dependent timestamp family (see Scaladoc). */
  private case object EventTime extends ColSpec

  /** FIXTURES.md schemas, pinned. */
  private val pinned: Map[String, Seq[(String, ColSpec)]] = Map(
    "region" -> Seq(
      "r_regionkey" -> Exact(IntegerType), "r_name" -> Exact(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> Exact(IntegerType), "n_name" -> Exact(StringType),
      "n_regionkey" -> Exact(IntegerType)),
    "customer" -> Seq(
      "c_custkey" -> Exact(LongType), "c_name" -> Exact(StringType),
      "c_nationkey" -> Exact(IntegerType), "c_acctbal" -> Exact(DoubleType),
      "c_mktsegment" -> Exact(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> Exact(LongType), "s_name" -> Exact(StringType),
      "s_nationkey" -> Exact(IntegerType), "s_acctbal" -> Exact(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> Exact(LongType), "p_name" -> Exact(StringType),
      "p_brand" -> Exact(StringType), "p_type" -> Exact(StringType),
      "p_size" -> Exact(IntegerType), "p_retailprice" -> Exact(DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> Exact(LongType), "o_custkey" -> Exact(LongType),
      "o_orderstatus" -> Exact(StringType), "o_totalprice" -> Exact(DoubleType),
      "o_orderdate" -> EventTime, "o_orderpriority" -> Exact(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> Exact(LongType), "l_partkey" -> Exact(LongType),
      "l_suppkey" -> Exact(LongType), "l_linenumber" -> Exact(IntegerType),
      "l_quantity" -> Exact(DoubleType), "l_extendedprice" -> Exact(DoubleType),
      "l_discount" -> Exact(DoubleType), "l_tax" -> Exact(DoubleType),
      "l_returnflag" -> Exact(StringType), "l_linestatus" -> Exact(StringType),
      "l_shipdate" -> EventTime),
    "events" -> Seq(
      "event_id" -> Exact(LongType), "ts" -> EventTime,
      "user_id" -> Exact(LongType), "event_type" -> Exact(StringType),
      "value" -> Exact(DoubleType), "props" -> Exact(StringType)),
    "documents" -> Seq(
      "doc_id" -> Exact(LongType), "text" -> Exact(StringType),
      "lang" -> Exact(StringType), "source" -> Exact(StringType),
      "n_chars" -> Exact(LongType)),
    "embeddings" -> Seq(
      "vec_id" -> Exact(LongType), "embedding" -> Exact(ArrayType(FloatType)),
      "label" -> Exact(IntegerType)))

  private def drift(tbl: String, col: String, found: DataType, want: String): Nothing =
    throw new IllegalStateException(
      s"fixture drift: $tbl.$col read as ${found.sql} but FIXTURES.md pins $want " +
        "— the driver-side writer changed the parquet footer; " +
        "update graft.engine.Tables.pinned deliberately, do not patch call sites")

  /** Assert `df` against the pinned schema for `tbl`, normalizing only the
    * documented event-time footer shapes. Column ORDER is canonicalized
    * rather than asserted (a by-name projection — reorder drift is
    * harmless and every consumer selects by name); a missing, extra, or
    * retyped column fails loudly. Schema-only: no data is read. */
  private[graft] def checked(df: DataFrame, tbl: String): DataFrame = {
    val spec = pinned(tbl)
    val names = df.schema.fieldNames.toSet
    if (names != spec.map(_._1).toSet)
      throw new IllegalStateException(
        s"fixture drift: $tbl columns ${df.schema.fieldNames.toSeq.sorted} " +
          s"but FIXTURES.md pins ${spec.map(_._1).sorted}")
    val cols = spec.map { case (name, cs) =>
      val dt = df.schema(name).dataType
      cs match {
        case Exact(want) =>
          if (dt != want) drift(tbl, name, dt, want.sql)
          col(name)
        case EventTime => dt match {
          case TimestampNTZType | TimestampType => col(name) // footer-faithful
          case LongType =>
            // legacy TIMESTAMP(NANOS) under nanosAsLong: integer division —
            // `/` on longs is double division in Spark and loses
            // microseconds at nano-epoch magnitude (1.7e18 > 2^53)
            timestamp_micros(expr(s"$name DIV 1000")).as(name)
          case other =>
            drift(tbl, name, other, "a timestamp (NTZ, LTZ, or legacy nanos-long)")
        }
      }
    }
    df.select(cols: _*)
  }

  /** Epoch microseconds, total over both timestamp types: for NTZ the cast
    * interprets the naive value in the session time zone (pinned UTC),
    * which is exactly DuckDB's `epoch_us` on a naive TIMESTAMP — both
    * engines make identical cuts. No-op cast for TimestampType. */
  def epochUs(c: Column): Column = unix_micros(c.cast(TimestampType))

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def load(s: SparkSession, d: String, name: String): DataFrame =
    checked(table(s, d, name), name)

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
