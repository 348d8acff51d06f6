package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fixture catalog (FIXTURES.md). Tables are driver-generated Parquet at
  * `$dir/<name>.parquet`; Parquet is self-describing so schemas come from
  * the footers (pinned in FIXTURES.md). At 100 TB scale these reads are
  * partition-parallel vectorized columnar scans; all filters/projections
  * applied on top are pushed into the scan by Catalyst.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) in the parquet footer, which Spark 4
    * rejects outright; with `spark.sql.legacy.parquet.nanosAsLong=true`
    * (set in Verify/Bench/test sessions) it surfaces as nano-epoch LongType
    * and is normalized here to a microsecond TimestampType — the same
    * truncation DuckDB applies when fetching TIMESTAMP_NS rows.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // integer division — `/` on longs is double division in Spark and
        // loses microseconds at nano-epoch magnitude (1.7e18 > 2^53)
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
