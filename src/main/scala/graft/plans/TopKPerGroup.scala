package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{StructField, StructType}

/** R8g [EXT] — whole-operator top-k per group, the (c) escalation rung of
  * SURVEY.md §2.8: custom `LogicalPlan` + `Strategy` + `SparkPlan`,
  * registered through `SparkSessionExtensions.injectPlannerStrategy`.
  *
  * The declarative form — `row_number().over(Window.partitionBy(g)
  * .orderBy(o)) <= k` — is what the engine's own X3 queries use, and it
  * plans as exchange + FULL SORT of every partition: O(rows log rows)
  * time and O(partition) sort memory (spill) to keep k rows per group.
  * This operator computes the same result aggregation-style: a partial
  * pass holds a bounded k-row heap per group per input partition, the
  * exchange moves only survivors (≤ groups×k×partitions rows, vs ALL
  * rows), and a final pass merges heaps per group. At 100 TB with k=5
  * and a thousand groups the shuffle shrinks by orders of magnitude and
  * nothing ever sorts more than k rows at once.
  *
  * Semantics: rows of `child`, keeping for each distinct value of
  * `groupExprs` the first `k` rows by `sortOrder`. The caller supplies a
  * TOTAL order (tie-break included) for deterministic output, same as
  * they would for the window form. Output order within/across groups is
  * not defined (order explicitly downstream, as after any aggregate).
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKPerGroup {
  /** Column-API entry: `TopKPerGroup(df, Seq($"g"), Seq($"x".desc, $"id"), 5)`.
    * Plain columns in `orderBy` sort ascending; use `.desc`/`.asc_nulls_last`
    * markers for anything else.
    */
  def apply(df: DataFrame, groupBy: Seq[Column], orderBy: Seq[Column], k: Int): DataFrame = {
    // In Spark 4 a Column is a lazy ColumnNode resolved only when the
    // analyzer sees it inside a KNOWN operator — inside a custom node it
    // would reach execution unresolved (and unserializable). Route the
    // columns through two throwaway analyzed operators and harvest the
    // resolved catalyst expressions from them.
    import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort}
    val sorted = ColumnBridge.logicalPlan(df.sortWithinPartitions(orderBy: _*))
      .asInstanceOf[Sort]
    val projected = ColumnBridge.logicalPlan(df.select(groupBy: _*))
      .asInstanceOf[Project]
    val g = projected.projectList.map {
      case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
      case e => e
    }
    ColumnBridge.ofRows(df.sparkSession,
      new TopKPerGroup(g, sorted.order, k, sorted.child))
  }

  /** Top-k per group plus a 1-based `rankCol`, through the native
    * operator: the bounded-heap passes reduce each group to k rows, and
    * only the ≤ groups×k survivors go through the rank window — its
    * exchange and sort never see the full input. Unreferenced child
    * columns are pruned beneath the node by [[TopKColumnPruning]], so
    * wide payloads never ride the survivor shuffle uninvited.
    */
  def topKRanked(df: DataFrame, groupBy: Seq[Column], orderBy: Seq[Column],
                 k: Int, rankCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    apply(df, groupBy, orderBy, k).withColumn(rankCol,
      row_number().over(Window.partitionBy(groupBy: _*).orderBy(orderBy: _*)))
  }

  /** R8g query — top-3 orders by total price per order priority, through
    * the native operator (total order: price desc, orderkey asc). The
    * oracle twin is the window form — same rows, different machinery.
    */
  def r8gTopKGrouped(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val o = graft.engine.Tables.orders(s, dir)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    apply(o, Seq(col("o_orderpriority")),
        Seq(col("o_totalprice").desc, col("o_orderkey")), k = 3)
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc, col("o_orderkey"))
  }

  val r8gSql: String =
    """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders)
      |WHERE rk <= 3
      |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin
}

/** Column pruning through [[TopKPerGroup]]: a custom logical node is
  * opaque to Catalyst's built-in `ColumnPruning`, so without help every
  * column of the child — embeddings included — would ride the survivor
  * shuffle even when the query above selects three scalars. This rule
  * restores the standard behavior: when a parent `Project` (or the
  * node's own group/order expressions) doesn't need some child outputs,
  * a narrowing `Project` is pushed beneath the node, where the built-in
  * rules then merge it on down into the scan.
  */
object TopKColumnPruning extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // the required set is computed ONCE and shared by the narrowing test
    // and the rewrite — a drifted duplicate could prune a column the
    // guard still considered required
    case p @ Project(_, TopKPerGroup(g, so, k, child)) if child.resolved =>
      val required = p.references ++
        AttributeSet(g.flatMap(_.references)) ++
        AttributeSet(so.flatMap(_.references))
      if ((child.outputSet -- required).isEmpty) p
      else p.copy(child = TopKPerGroup(g, so, k,
        Project(child.output.filter(required.contains), child)))
  }
}

/** Planner strategy: logical TopKPerGroup → partial exec (bounded heaps
  * per input partition) feeding a final exec that demands clustering on
  * the group key — EnsureRequirements inserts the (survivor-only)
  * exchange between them, exactly like partial/final hash aggregation.
  */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, so, k, child) =>
      // normalize float/double group keys (0.0 == -0.0, one NaN) exactly
      // as Catalyst does for Aggregate/Window keys — the exec groups by
      // raw UnsafeRow bytes and the exchange hashes the raw bits, so
      // unnormalized ±0.0 would land in different partitions and emit up
      // to 2k rows where the window form emits k
      val ng = g.map(ColumnBridge.normalizeFloats)
      val part = TopKPerGroupExec(ng, so, k, planLater(child), partial = true)
      TopKPerGroupExec(ng, so, k, part, partial = false) :: Nil
    case _ => Nil
  }
}

/** Physical top-k per group. Fast path: a hash map of bounded k-row
  * heaps — O(groups-per-partition × k) memory. High group cardinality
  * would make that unbounded, so past
  * `spark.graft.topk.fallbackThreshold` distinct keys (default 65536)
  * the operator degrades gracefully instead of OOMing: keys already in
  * the map keep their heaps (pre-aggregation stays effective for hot
  * groups), while rows of NEW keys divert to an
  * [[org.apache.spark.sql.execution.UnsafeKVExternalSorter]] — Spark's
  * memory-managed, spill-capable sorter (the `ObjectHashAggregateExec`
  * fallback discipline). A key is owned by exactly one side, so both
  * produce exact per-group top-k: the sorter clusters each overflow
  * group contiguously and a single k-heap streams over each run.
  */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil
  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroupFinal"

  override lazy val metrics = Map(
    "sortFallbackRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "rows diverted to sort fallback"))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val gExprs = groupExprs
    val order = sortOrder
    val kk = k
    val maxKeys = conf.getConfString("spark.graft.topk.fallbackThreshold", "65536").toInt
    val fallbackMetric = longMetric("sortFallbackRows")
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(gExprs, childOutput)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      // "row comes first" ordering; the heap is a max-heap under it, so
      // the head is the worst row currently kept for the group
      val lt = GenerateOrdering.generate(
        BindReferences.bindReferences(order, childOutput))
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      val heapOrd = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = lt.compare(b, a)
      }
      def newHeap(): java.util.PriorityQueue[InternalRow] =
        new java.util.PriorityQueue[InternalRow](kk + 1, heapOrd)
      def offer(pq: java.util.PriorityQueue[InternalRow], row: InternalRow): Unit =
        if (pq.size() < kk) pq.add(row.copy())
        else if (lt.compare(row, pq.peek()) < 0) {
          pq.poll()
          pq.add(row.copy())
        }

      var sorter: org.apache.spark.sql.execution.UnsafeKVExternalSorter = null
      def createSorter() = {
        val env = org.apache.spark.SparkEnv.get
        val keySchema = StructType(gExprs.zipWithIndex.map { case (e, i) =>
          StructField(s"k$i", e.dataType, e.nullable)
        })
        val valueSchema = StructType(childOutput.map(a =>
          StructField(a.name, a.dataType, a.nullable)))
        new org.apache.spark.sql.execution.UnsafeKVExternalSorter(
          keySchema, valueSchema, env.blockManager, env.serializerManager,
          ColumnBridge.taskPageSizeBytes(),
          Int.MaxValue, Long.MaxValue)
      }
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => if (sorter != null) sorter.cleanupResources()))

      iter.foreach { row =>
        val key = keyProj(row)
        val pq = heaps.get(key)
        if (pq != null) offer(pq, row)
        else if (sorter == null && heaps.size() < maxKeys) {
          val fresh = newHeap()
          heaps.put(key.copy(), fresh)
          offer(fresh, row)
        } else {
          // map at capacity and this key is not in it: external-sort lane
          if (sorter == null) sorter = createSorter()
          fallbackMetric += 1
          val u = row match {
            case ur: UnsafeRow => ur
            case r             => toUnsafe(r)
          }
          sorter.insertKV(key, u)
        }
      }

      import scala.jdk.CollectionConverters._
      val heapRows = heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
      if (sorter == null) heapRows
      else heapRows ++ new Iterator[InternalRow] {
        // stream the key-clustered runs: one bounded heap alive at a time
        private val kv = sorter.sortedIterator()
        private var kvHasNext = kv.next()
        private var pending: java.util.Iterator[InternalRow] =
          java.util.Collections.emptyIterator()
        override def hasNext: Boolean = pending.hasNext || kvHasNext
        override def next(): InternalRow = {
          if (!pending.hasNext) {
            val pq = newHeap()
            val runKey = kv.getKey.copy()
            var inRun = true
            while (inRun) {
              offer(pq, kv.getValue)
              kvHasNext = kv.next()
              inRun = kvHasNext && kv.getKey == runKey
            }
            pending = pq.iterator()
          }
          pending.next()
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
