package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Relational, Similarity}

/** Physical-plan property pins (SURVEY.md §4.4): the scale design is a
  * claim about PLANS, not just results — these specs fail if a future
  * change silently degrades a broadcast to a shuffle, drops the top-k
  * operator, or knocks the native expressions out of codegen.
  */
class PlanSpec extends SparkSpec {

  private def planString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("R2: dimension joins broadcast — no sort-merge, no shuffle join") {
    val p = planString(Relational.r2BroadcastJoin(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(500))
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("ShuffledHashJoin"))
  }

  test("R8: top-k plans as TakeOrderedAndProject, not a full sort") {
    val p = planString(Relational.r8TopK(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p.take(500))
  }

  test("Q1: aggregation is two-phase (partial map-side before the shuffle)") {
    val p = planString(Relational.q1Revenue(spark, sfDir))
    // partial + final HashAggregate pair around one exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(800))
    assert(p.contains("Exchange"))
  }

  test("X3: brute-force top-k broadcasts the query side, not the corpus") {
    val p = planString(Similarity.x3CosineTopK(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(500))
  }

  test("native dot_f64 stays inside whole-stage codegen (no fallback)") {
    val df = Similarity.x3CosineTopK(spark, sfDir)
    df.collect() // finalize the adaptive plan so codegen stages are assigned
    val p = planString(df)
    assert(p.contains("dot_f64"), "expression missing from plan")
    // codegen stages print with a "*(n)" prefix in plan strings; every
    // operator line computing dot_f64 must carry one — a codegen
    // fallback would print the projection without the asterisk marker
    // AQE appends the pre-execution "== Initial Plan ==" section, which
    // never carries codegen markers — only the final plan is the claim
    val finalPlan = p.split("== Initial Plan ==").head
    val dotLines = finalPlan.linesIterator
      .filter(l => l.contains("dot_f64(") && l.contains("+-")).toSeq
    assert(dotLines.nonEmpty, "no operator lines computing dot_f64")
    assert(dotLines.forall(_.matches(""".*\*\(\d+\).*""")),
      s"dot_f64 projection outside whole-stage codegen:\n${dotLines.mkString("\n")}")
  }

  test("partition pruning: a partitioned sink is pruned by partition filters") {
    val dir = tmpDir("part_events")
    graft.engine.Tables.events(spark, sfDir)
      .withColumn("event_date", to_date(col("ts")))
      .write.partitionBy("event_date").mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .filter(col("event_date") === "2024-01-02")
      .select(col("event_id"))
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PartitionFilters: ["), p.take(1200))
    assert(p.contains("event_date"), p.take(1200))
    // the pruned scan must not enumerate every date partition
    val scanned = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }
    assert(scanned.nonEmpty && scanned.head <= 1,
      s"expected at most one selected partition, got $scanned")
  }

  test("R12: as-of join plans ONE data exchange (union + single keyed window)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = graft.operators.Temporal.r12AsofJoin(spark, sfDir)
    df.collect()
    // count hash-partition exchanges in the final adaptive plan; the
    // only permitted extras are the final presentation range sort
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 1, s"as-of join must shuffle once on the key, saw $hashEx:\n${plan.take(1500)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastNestedLoopJoin"),
      "the union-trick as-of must not plan a join at all")
  }

  test("X3: banded ANN never shuffles the corpus — only broadcast exchanges feed its joins") {
    val df = graft.operators.Similarity.x3AnnLsh(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // every join in the plan must be broadcast-fed; the only hash
    // exchanges allowed are the candidate distinct and the top-k window
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-side sort-merge join means the corpus shuffled:\n${plan.take(1500)}")
  }

  test("AQE splits a skewed join partition at runtime (the join analogue of r5_salted_agg)") {
    // isolated session: skew thresholds lowered so fixture-scale data
    // exhibits the 100 TB hot-key pattern; broadcast disabled to force
    // the shuffle join AQE must repair
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s2.implicits._
    val hot = s2.range(200000).select(lit(0L).as("k"), col("id").as("v"))
    val cold = s2.range(1000).select((col("id") % 50 + 1).as("k"), col("id").as("v"))
    val left = hot.union(cold)
    val right = s2.range(51).select(col("id").as("k"), col("id").as("w"))
    val j = left.join(right, Seq("k"))
    assert(j.collect().length == 201000) // execute THIS plan so AQE finalizes it
    val plan = j.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("skew=true"),
      s"AQE did not split the skewed partition:\n${plan.take(2500)}")
  }

  test("X4: redaction and chunking are narrow maps — no exchange except the presentation sort") {
    for (df <- Seq(graft.operators.TextAnalysis.x4Redact(spark, sfDir),
                   graft.operators.TextAnalysis.x4Chunk(spark, sfDir))) {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(!plan.contains("Exchange hashpartitioning"),
        s"narrow-map op shuffled:\n${plan.take(1200)}")
    }
  }

  test("no SparkEntry query plans a partition-less window over unbounded input, nor a cartesian product") {
    // a Window with an empty partitionSpec coalesces ALL rows to one
    // partition — a scale-killer unless its input is provably bounded
    // (beneath a small literal LIMIT, e.g. IVF's nlist-row seed ranking).
    // A CartesianProductExec is the non-broadcast all-pairs plan — every
    // intentional blocked product in the suite broadcasts its small side
    // (BroadcastNestedLoopJoin), so a cartesian anywhere means a
    // broadcast hint got lost or a join degenerated; this pins the
    // round-9 manual plan audit permanently, over every registered query
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, Window => LWindow}
    SparkEntry.queries.foreach { case (name, fn) =>
      val qe = fn(spark, sfDir).queryExecution
      qe.optimizedPlan.foreach {
        case w: LWindow if w.partitionSpec.isEmpty =>
          val bounded = w.child.collect {
            case GlobalLimit(Literal(n: Int, _), _) if n <= 64 => true
          }.nonEmpty
          assert(bounded, s"$name: partition-less window over unbounded input")
        case _ => ()
      }
      val cartesians = qe.sparkPlan.collect {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      }
      assert(cartesians.isEmpty, s"$name plans a CartesianProduct")
    }
  }

  test("scan pushdown: a filtered fixture scan reaches parquet PushedFilters") {
    val df = graft.engine.Tables.lineitem(spark, sfDir).filter(col("l_quantity") > 25.0)
      .select(col("l_orderkey"), col("l_quantity"))
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,25.0)]"),
      p.take(1200))
    // column pruning: the scan reads only the two referenced columns
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      p.take(1200))
  }
}
