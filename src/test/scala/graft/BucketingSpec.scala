package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Bucketing = the pre-shuffled co-located join (SURVEY.md §4.4 /
  * README "join discipline"): writing both join sides bucketed by the
  * join key lets Spark sort-merge-join them with ZERO exchanges — at
  * 100 TB this converts every recurring fact⋈fact join on the bucket key
  * from a full-data shuffle into a local per-bucket merge. The spec
  * pins the plan property itself (no ShuffleExchangeExec), not just the
  * result.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed co-located join plans with zero shuffle exchanges") {
    val s = spark
    // AQE coalescing is irrelevant here; disable auto-broadcast so the
    // join would otherwise require a shuffle on both sides
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(s, sfDir)
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_b")
      Tables.lineitem(s, sfDir)
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b")

      val joined = s.table("lineitem_b")
        .join(s.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))

      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // the only permissible shuffle is the post-join groupBy on
      // o_orderpriority; the join itself must be exchange-free
      assert(exchanges.size <= 1,
        s"expected at most the aggregation exchange, got ${exchanges.size}:\n" +
          joined.queryExecution.executedPlan)

      // and the result matches the unbucketed join
      val plain = Tables.lineitem(s, sfDir)
        .join(Tables.orders(s, sfDir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      assert(joined.orderBy("o_orderpriority").collect().toSeq ==
        plain.orderBy("o_orderpriority").collect().toSeq)
    } finally {
      s.sql("DROP TABLE IF EXISTS lineitem_b")
      s.sql("DROP TABLE IF EXISTS orders_b")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
