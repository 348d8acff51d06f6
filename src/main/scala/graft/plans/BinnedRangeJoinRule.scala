package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule making the binned range join (`RangeJoin.pointInInterval`)
  * transparent: an inner join whose only cross-side predicates are a range
  * band — `p >= lo AND p < hi` in any comparison flavor, `p` integral and
  * from one side, `lo`/`hi` integral and from the other — is rewritten to
  * an equi-join on a quantized bin key plus the original predicates as
  * residual filters.
  *
  * Without the rewrite Spark's only strategy for such a join is
  * BroadcastNestedLoopJoin (fine when a side is dimension-sized, quadratic
  * death when both are fact tables — the 100 TB failure mode). With it,
  * the planner sees an equi-key and picks a shuffle hash / sort-merge
  * join: partition-parallel, shuffle ∝ rows × bins-per-interval, per-bin
  * work ∝ true candidate count. Same idea as Databricks' range-join
  * binning hint, done as a stock `Rule[LogicalPlan]` via
  * `SparkSessionExtensions.injectOptimizerRule` (SURVEY.md §2.8
  * escalation step (c): custom plan rewrites only where composition
  * can't see the whole picture — here, inside the optimizer, where the
  * user just wrote SQL).
  *
  * Safety:
  *  - fires only on `Inner` joins with no join hint and no existing
  *    cross-side equality conjunct (so it never interferes with a join
  *    the planner can already hash);
  *  - fires only when BOTH sides' size estimates exceed the broadcast
  *    threshold (a broadcastable side makes BNLJ acceptable and cheaper
  *    than adding a shuffle) — with broadcasting disabled (threshold ≤ 0)
  *    every side counts as large;
  *  - the full original condition is kept as a residual filter, so the
  *    rewrite can only drop candidate pairs that could never match;
  *    bins are a superset of the touched range ([floor(lo/w), floor(hi/w)]
  *    regardless of bound strictness — at most one junk bin per side of
  *    the interval, discarded by the residual);
  *  - a (point, interval) candidate meets in exactly one bin — the
  *    point's own — so the rewrite introduces no duplicates;
  *  - the rewritten join has an equi-conjunct, so the rule cannot
  *    re-fire on its own output (fixed-point safe).
  *
  *  - reversed/empty intervals generate no bins (runtime `If` guard —
  *    see the inline note), and a stats-estimable bins-per-interval
  *    above the cap keeps the original join untouched.
  *
  * Config: `spark.graft.binnedRangeJoin.enabled` (default true),
  * `spark.graft.binnedRangeJoin.binWidth` (default 32 — pick near the
  * typical interval width; affects performance, never correctness),
  * `spark.graft.binnedRangeJoin.maxBinsPerInterval` (default 4096 —
  * plan-time skip cap when CBO column stats bound the interval width).
  */
case class BinnedRangeJoinRule(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.binnedRangeJoin.enabled", "true").toBoolean
  private def binWidth: Long =
    conf.getConfString("spark.graft.binnedRangeJoin.binWidth", "32").toLong
  private def maxBinsPerInterval: Long =
    conf.getConfString("spark.graft.binnedRangeJoin.maxBinsPerInterval", "4096").toLong

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled || binWidth <= 0) plan
    else plan.transformUp {
      // bothLarge (stats on both subtrees) is checked INSIDE rewrite,
      // after the cheap syntactic band detection — the overwhelmingly
      // common equi/band-free joins bail before any stats work
      case j @ Join(_, _, Inner, Some(cond), hint) if hint == JoinHint.NONE =>
        rewrite(j, cond).getOrElse(j)
    }

  private def bothLarge(l: LogicalPlan, r: LogicalPlan): Boolean = {
    val t = conf.autoBroadcastJoinThreshold
    t <= 0 || (l.stats.sizeInBytes > t && r.stats.sizeInBytes > t)
  }

  /** A bound fact `p OP b` (directed: `p` is the bounded expression). */
  private case class Bound(p: Expression, b: Expression, src: Expression)

  private def rewrite(j: Join, cond: Expression): Option[LogicalPlan] = {
    val l = j.left
    val r = j.right
    val conjuncts = splitConjunctivePredicates(cond)

    def splitSides(a: Expression, b: Expression): Boolean =
      a.references.nonEmpty && b.references.nonEmpty &&
        ((a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
          (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet)))

    // An existing cross-side equality means the planner already has a
    // hash key — adding a bin key would only widen the shuffle.
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b)       => splitSides(a, b)
      case EqualNullSafe(a, b) => splitSides(a, b)
      case _                   => false
    }
    if (hasEqui) return None

    val lowers = scala.collection.mutable.ArrayBuffer.empty[Bound]
    val uppers = scala.collection.mutable.ArrayBuffer.empty[Bound]
    conjuncts.foreach {
      case c @ GreaterThan(a, b) if splitSides(a, b) && integral(a) && integral(b) =>
        lowers += Bound(a, b, c); uppers += Bound(b, a, c)
      case c @ GreaterThanOrEqual(a, b) if splitSides(a, b) && integral(a) && integral(b) =>
        lowers += Bound(a, b, c); uppers += Bound(b, a, c)
      case c @ LessThan(a, b) if splitSides(a, b) && integral(a) && integral(b) =>
        uppers += Bound(a, b, c); lowers += Bound(b, a, c)
      case c @ LessThanOrEqual(a, b) if splitSides(a, b) && integral(a) && integral(b) =>
        uppers += Bound(a, b, c); lowers += Bound(b, a, c)
      case _ => ()
    }

    // Find a point expression bounded from below AND above by the other
    // side (two distinct conjuncts — one conjunct registers both a lower
    // for its left operand and an upper for its right, never a band).
    val band = (for {
      lo <- lowers.iterator
      hi <- uppers.iterator
      if !(lo.src eq hi.src) && lo.p.semanticEquals(hi.p)
    } yield (lo, hi)).nextOption()

    band.flatMap { case (lo, hi) =>
      if (!bothLarge(l, r)) return None
      val p = lo.p
      val pointIsLeft = p.references.subsetOf(l.outputSet)
      val pointChild = if (pointIsLeft) l else r
      val ivChild = if (pointIsLeft) r else l

      val w = Literal(binWidth.toDouble)
      def binOf(e: Expression): Expression = Floor(Divide(Cast(e, DoubleType), w))
      val binLo = binOf(lo.b)
      val binHi = binOf(hi.b)

      // Plan-time width estimate: with CBO column stats on the bound
      // attributes, max(hi) − min(lo) bounds every interval's width from
      // above; past the cap, keep the original join — a plan the engine
      // can always run beats one that manufactures per-row bin arrays
      // with no size bound. (Bounds always reference the interval side's
      // attributes — splitSides guarantees it — so there is no foldable
      // case to fold.) Without stats the rewrite proceeds, and the
      // RUNTIME cap below turns a wide interval into a diagnosable error
      // instead of a sequence-limit failure/OOM; the DataFrame API
      // (RangeJoin.pointInInterval) measures the true width with an
      // aggregate first and falls back to the (hinted) theta join.
      if (estimatedMaxBins(lo.b, hi.b, ivChild).exists(_ > maxBinsPerInterval)) None
      else {
        val pbin = Alias(binOf(p), "__gr_pbin")()
        val pointPlan = Project(pointChild.output :+ pbin, pointChild)

        // Sequence is TimeZoneAwareExpression — without an explicit zone it
        // stays unresolved and the optimizer's plan-integrity check fails.
        // Guards, innermost out:
        //  - a reversed/empty interval (lo > hi, or a null bound)
        //    generates NO bins — unguarded, Sequence silently DESCENDS on
        //    lo > hi, manufacturing |lo−hi|/binWidth junk bins per row (an
        //    unsatisfiable predicate turned into an OOM for a large
        //    reversal). Dropping the row is exact: an inner-join row with
        //    an empty interval can never match.
        //  - an interval wider than maxBinsPerInterval (possible only in
        //    the stats-less SQL path — an open-ended sentinel hi is the
        //    classic case) RAISES a diagnosable error naming the configs,
        //    instead of silently building an unbounded per-row array that
        //    dies as an opaque sequence-length failure or executor OOM.
        val seq = Sequence(binLo, binHi, None, Some(conf.sessionLocalTimeZone))
        val tooWide = GreaterThan(Subtract(binHi, binLo),
          Literal(maxBinsPerInterval - 1L))
        val bail = Cast(new RaiseError(Literal(
          s"graft binned range join: an interval spans more than $maxBinsPerInterval bins " +
            s"(binWidth=$binWidth); raise spark.graft.binnedRangeJoin.binWidth or " +
            "maxBinsPerInterval, or disable spark.graft.binnedRangeJoin.enabled")),
          seq.dataType)
        val guarded = If(LessThanOrEqual(binLo, binHi),
          If(tooWide, bail, seq),
          Literal.create(Array.empty[Long], seq.dataType))
        val gen = Explode(guarded)
        val elem = gen.elementSchema.head
        val ibin = AttributeReference("__gr_ibin", elem.dataType, elem.nullable)()
        val ivPlan = Generate(gen, unrequiredChildIndex = Nil, outer = false,
          qualifier = None, generatorOutput = Seq(ibin), child = ivChild)

        val newCond = (EqualTo(pbin.toAttribute, ibin) +: conjuncts).reduce(And)
        val (nl, nr) = if (pointIsLeft) (pointPlan, ivPlan) else (ivPlan, pointPlan)
        Some(Project(j.output, Join(nl, nr, Inner, Some(newCond), JoinHint.NONE)))
      }
    }
  }

  /** Upper bound on bins-per-interval from CBO column stats: every
    * interval's width is ≤ max(hi) − min(lo) when both bound attributes
    * carry stats. None when stats are absent (the common un-ANALYZEd
    * case) or a bound is a computed expression.
    */
  private def estimatedMaxBins(loB: Expression, hiB: Expression,
                               ivChild: LogicalPlan): Option[Long] = {
    def stat(e: Expression, pick: org.apache.spark.sql.catalyst.plans.logical.ColumnStat => Option[Any]): Option[Long] =
      e match {
        case a: Attribute =>
          ivChild.stats.attributeStats.get(a).flatMap(pick).collect {
            case n: Number => n.longValue()
          }
        case _ => None
      }
    for {
      mn <- stat(loB, _.min)
      mx <- stat(hiB, _.max)
      // +2, not +1: an interval straddling a bin boundary touches one
      // more bin than its width/binWidth quotient (min(lo)=31, max(hi)=33,
      // w=32 → 2 true bins but (33-31)/32+1 = 1) — with +1 this was not
      // the upper bound its contract claims
    } yield (mx - mn) / binWidth + 2
  }
}
