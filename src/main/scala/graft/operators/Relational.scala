package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
