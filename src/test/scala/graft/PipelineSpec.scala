package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Pipeline
import graft.sources.Sinks

/** Pinning the reference's pandas semantics on frames with real nulls
  * (fixtures are null-free — FIXTURES.md caveats; SURVEY.md N1–N3).
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def nullyFrame = {
    val schema = StructType(Seq(
      StructField("a", IntegerType, nullable = true),
      StructField("b", StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1, "x"), Row(null, "y"), Row(3, null), Row(null, null))),
      schema)
  }

  test("P1 dropna(any) drops rows with at least one null") {
    val out = nullyFrame.na.drop("any").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1))).toSet == Set((1, "x")))
  }

  test("P2 dropna(all) drops only all-null rows") {
    val out = nullyFrame.na.drop("all").count()
    assert(out == 3)
  }

  test("N1: NaN is a value, not a null — na.drop removes both (pandas parity)") {
    val df = Seq((1, Double.NaN), (2, 1.5)).toDF("id", "v")
      .withColumn("v", when(col("id") === 1, lit(Double.NaN)).otherwise(col("v")))
    assert(df.na.drop("any").count() == 1) // NaN dropped like pandas dropna
  }

  test("N2: unionByName aligns by name and null-fills, not positionally") {
    val a = Seq((1, "x", 10.0)).toDF("id", "name", "acctbal")
    val b = Seq((2, 99, "EU")).toDF("id", "nationkey", "name2")
    val u = a.unionByName(b.withColumnRenamed("name2", "name"), allowMissingColumns = true)
    val cols = u.columns.toSeq
    assert(cols == Seq("id", "name", "acctbal", "nationkey"))
    val row2 = u.filter(col("id") === 2).collect().head
    assert(row2.getAs[String]("name") == "EU")
    assert(row2.isNullAt(cols.indexOf("acctbal")))
  }

  test("N3: upsert keeps the max-offset row per key, deterministic tie-break") {
    val store = tmpDir("upsert")
    val batch1 = Seq((10L, 1L, "a"), (11L, 1L, "b"), (12L, 2L, "c")).toDF("offset", "id", "payload")
    Sinks.upsertByKey(batch1, "id", "offset", store)
    val batch2 = Seq((13L, 2L, "d"), (14L, 3L, "e")).toDF("offset", "id", "payload")
    Sinks.upsertByKey(batch2, "id", "offset", store)
    val out = spark.read.parquet(store).orderBy("id")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("payload"))).toSeq
    assert(out == Seq((1L, "b"), (2L, "d"), (3L, "e")))
  }

  test("A2 gate emits nothing when count <= threshold") {
    val df = graft.engine.Tables.customer(spark, sfDir).filter(col("c_acctbal") > 1e12)
    val n = df.agg(count(lit(1)).as("gate_n"))
    val gated = df.crossJoin(broadcast(n)).filter(col("gate_n") > 10).drop("gate_n")
    assert(gated.count() == 0)
  }

  test("N3: upsert survives an empty first batch (store with no bucket partitions yet)") {
    val store = tmpDir("upsert_empty")
    val empty = Seq.empty[(Long, Long, String)].toDF("offset", "id", "payload")
    Sinks.upsertByKey(empty, "id", "offset", store)   // leaves no bucket dirs
    Sinks.upsertByKey(empty, "id", "offset", store)   // still treated as absent, no crash
    val batch = Seq((10L, 1L, "a")).toDF("offset", "id", "payload")
    Sinks.upsertByKey(batch, "id", "offset", store)
    val out = spark.read.parquet(store).select("id", "payload").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "a")))
  }

  test("A4: dlq split partitions the input and joins multiple reasons in check order") {
    val df = Seq(
      (1L, 10.0, 5),   // valid
      (2L, -1.0, 5),   // negative_balance
      (3L, -2.0, 25),  // both reasons
      (4L, 3.0, 30)    // invalid_nation
    ).toDF("c_custkey", "c_acctbal", "c_nationkey")
    val (valid, dlq) = Pipeline.dlqSplit(df, Seq(
      "negative_balance" -> (col("c_acctbal") < 0),
      "invalid_nation" -> (col("c_nationkey") >= 20)))
    assert(valid.count() + dlq.count() == df.count(), "split must partition the input")
    assert(valid.select("c_custkey").collect().map(_.getLong(0)).toSeq == Seq(1L))
    val reasons = dlq.orderBy("c_custkey").collect()
      .map(r => (r.getAs[Long]("c_custkey"), r.getAs[String]("dlq_reason"))).toSeq
    assert(reasons == Seq(
      (2L, "negative_balance"),
      (3L, "negative_balance,invalid_nation"),
      (4L, "invalid_nation")))
  }

  test("P7 parity: per-page index equals the reference's global index on one-page data") {
    val perPage = Pipeline.p7TagIndex(spark, sfDir).filter(col("type") === "link")
      .select("index", "content").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    val global = Pipeline.p7TagIndexGlobal(spark, sfDir).filter(col("type") === "link")
      .select("index", "content").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(perPage.nonEmpty && perPage == global)
  }

  test("P7/S8 index is 1-based and per-type") {
    val out = Pipeline.p7TagIndex(spark, sfDir)
      .groupBy("type").agg(min("index").as("mn")).collect()
    assert(out.forall(_.getAs[Int]("mn") == 1))
  }
}
