package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Exact, Tables}

/** Round-18 A/B probe (VERDICT r17 item 7): does an explicit runtime
  * bloom filter on q21's `others` side (the full-lineitem EXISTS probe)
  * beat the fact×fact SortMergeJoin at sf0.1, and does it shrink the
  * shuffle? Measurement-only main — q21 itself is unchanged unless this
  * records a win.
  *
  * Usage: runMain graft.Probe13 <sfDir>
  */
object Probe13 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(e => new graft.functions.GraftExtensions()(e))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def late(s: SparkSession) = {
      val o = Tables.orders(s, sfDir).filter(col("o_orderstatus") === "F")
      Tables.lineitem(s, sfDir).join(o, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select(col("l_orderkey").as("lk"), col("l_suppkey").as("sk"))
    }
    // selectivity: how many lineitem rows would a perfect semi-filter keep?
    val nLine = Tables.lineitem(spark, sfDir).count()
    val lt = late(spark)
    val nLate = lt.count()
    val nLk = lt.select(col("lk")).distinct().count()
    val nOrd = Tables.lineitem(spark, sfDir).select(col("l_orderkey")).distinct().count()
    println(f"[probe13] lineitem=$nLine late=$nLate distinct_lk=$nLk distinct_orderkeys=$nOrd " +
      f"(bloom keeps ~${nLk * 100.0 / nOrd}%.1f%% of orders)")

    def q21Current(s: SparkSession): DataFrame =
      graft.operators.Analytics.q21WaitingSupplier(s, sfDir)

    def q21Bloom(s: SparkSession): DataFrame = {
      val o = Tables.orders(s, sfDir).filter(col("o_orderstatus") === "F")
      val l = Tables.lineitem(s, sfDir)
      val lateDf = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select(col("l_orderkey").as("lk"), col("l_suppkey").as("sk"),
          col("o_orderdate").as("od"))
      // manual runtime bloom (guide §3.2): drop definitely-non-matching
      // lineitem rows before the EXISTS probe's exchange
      val bf = lateDf.stat.bloomFilter("lk", math.max(1000L, nLk), 0.01)
      val bfB = s.sparkContext.broadcast(bf)
      val maybeLate = udf((id: Long) => bfB.value.mightContainLong(id))
      val others = l.filter(maybeLate(col("l_orderkey")))
        .select(col("l_orderkey").as("o_lk"), col("l_suppkey").as("o_sk"))
      val lateOthers = lateDf.select(col("lk").as("a_lk"), col("sk").as("a_sk"))
      lateDf
        .join(others, col("lk") === col("o_lk") && col("sk") =!= col("o_sk"), "left_semi")
        .join(lateOthers, col("lk") === col("a_lk") && col("sk") =!= col("a_sk"), "left_anti")
        .join(Tables.supplier(s, sfDir), col("sk") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(countDistinct(col("lk")).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }

    // equality first: the variant must be row-identical
    val a = q21Current(spark).collect().map(_.toString).toSeq
    val b = q21Bloom(spark).collect().map(_.toString).toSeq
    require(a == b, s"bloom variant diverged:\n$a\nvs\n$b")
    println("[probe13] bloom variant row-identical to current q21")

    for (pass <- 1 to 3) {
      for ((name, fn) <- Seq("current" -> (() => q21Current(spark)),
                             "bloom" -> (() => q21Bloom(spark)))) {
        val t0 = System.nanoTime()
        fn().count()
        println(f"[probe13] pass $pass $name%-8s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      }
    }
    spark.stop()
  }
}
