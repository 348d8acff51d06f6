package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.{SparkSessionExtensions, SparkSessionExtensionsProvider}

/** Native Catalyst expression for the embedding hot loop (SURVEY.md §2.7
  * X2d/X3): dot product over two `array<double>` columns.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,v) -> acc+v)`) is
  * semantically identical but runs on the interpreted lambda path and
  * allocates an intermediate array per row — at sf0.1 the brute-force
  * pair scan spent ~23 s there. This expression participates in
  * whole-stage codegen with a tight primitive loop (no allocation, no
  * virtual calls per element), the (c) escalation step of the custom-op
  * policy in SURVEY.md §2.8.
  *
  * Semantics: null if either array is null; element nulls are not
  * expected (embedding vectors are dense) and are read as 0.0 via
  * `ArrayData.getDouble`. Lengths may differ; the overlap is used —
  * callers pass equal-length vectors.
  */
case class DotProductF64(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must already be array<double> — the Column entry point and the
  // SQL builder below insert the cast, keeping this node cast-free in the
  // generated loop.
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f64"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF64 =
    copy(left = newLeft, right = newRight)
}

/** Native banded random-hyperplane signature (SURVEY.md §2.7 X2d'/X3):
  * all `nBands` band values of a vector in ONE compiled loop — the
  * [[MinHashSig]] escalation applied to hyperplane banding.
  *
  * The Column-composed formulation (an `array(...)` of per-band sums of
  * `when(dot_f64(e, <64-double array literal>) >= 0, 1<<r)`) inlines
  * bands×planes×64 literal doubles into a single projection; at the
  * corpus-derived geometries of `Dedup.embeddingGeometry` (225 planes at
  * n=20k, 504 at the 12-plane clamp) the generated `processNext()`
  * exceeds janino's 64 KB method limit and the WHOLE stage silently
  * falls back to interpreted evaluation — measured as the 1,775 s
  * `x2_embedding_lsh` ×10 artifact of the round-8 stress run. Here the
  * plane table is a process-wide constant (splitmix64-derived, identical
  * to `Similarity.planeComponents` — one parity spec pins that) and the
  * generated code is ONE static call per row at every geometry.
  *
  * Semantics match the composed form exactly: plane p component j is
  * ±1 by splitmix64(p*1000+j) parity over 64 dims, the dot runs over
  * `min(len(e), 64)` elements ([[DotProductF64]]'s overlap rule), bit r
  * of band b is set iff the plane `b*rowsPerBand + r` dot is `>= 0`.
  * CodegenFallback is deliberate, as in [[MinHashSig]]: the eval body is
  * a tight primitive loop behind a projection boundary — one virtual
  * call per ROW, constant generated-code size at any geometry.
  */
case class HyperplaneBandSig(child: Expression, nBands: Int, rowsPerBand: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
  override def prettyName: String = "hyperplane_bands"

  override protected def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val planes = HyperplaneBandSig.planeTable(nBands * rowsPerBand)
    val dims = math.min(e.numElements(), HyperplaneBandSig.Dims)
    val out = new Array[Long](nBands)
    var b = 0
    var p = 0
    while (b < nBands) {
      var band = 0L
      var r = 0
      while (r < rowsPerBand) {
        val base = p * HyperplaneBandSig.Dims
        var s = 0.0
        var j = 0
        while (j < dims) { s += e.getDouble(j) * planes(base + j); j += 1 }
        if (s >= 0.0) band |= (1L << r)
        r += 1
        p += 1
      }
      out(b) = band
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBandSig =
    copy(child = newChild)
}

object HyperplaneBandSig {
  /** Hyperplane dimensionality — fixed at 64, as in the composed form. */
  val Dims = 64

  /** ±1 component j of plane p — THE canonical derivation:
    * `Similarity.planeComponents` (which generates the DuckDB ANN twin's
    * SQL literals) delegates here, so native-vs-oracle plane parity holds
    * by construction (Round8Spec still pins it).
    */
  private[graft] def component(p: Int, j: Int): Double =
    if (Math.floorMod(SplitMix.splitmix64(p * 1000L + j), 2L) == 1L) 1.0 else -1.0

  // flat [plane0 | plane1 | ...] tables, grown monotonically and cached
  // per requested plane count (geometries vary per corpus size)
  private val tables = new java.util.concurrent.ConcurrentHashMap[Int, Array[Double]]()
  private[graft] def planeTable(nPlanes: Int): Array[Double] =
    tables.computeIfAbsent(nPlanes, { n =>
      val t = new Array[Double](n * Dims)
      var p = 0
      while (p < n) {
        var j = 0
        while (j < Dims) { t(p * Dims + j) = component(p, j); j += 1 }
        p += 1
      }
      t
    })
}

/** Column-level entry points for the native vector expressions. */
object VectorFunctions {
  /** `dot_f64(a, b)` as a Column — usable from any session (no
    * registration needed for the DataFrame API path).
    */
  def dotF64(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductF64(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))

  /** `hyperplane_bands(e, nBands, rowsPerBand)` as a Column. */
  def hyperplaneBands(e: Column, nBands: Int, rowsPerBand: Int): Column =
    ColumnBridge.column(HyperplaneBandSig(
      ColumnBridge.expression(e.cast("array<double>")), nBands, rowsPerBand))
}

/** SQL-surface registration (`SELECT dot_f64(a, b) ...`) via the public
  * extensions mechanism: `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends SparkSessionExtensionsProvider {
  // raw children(i) indexing would silently DROP extra arguments (a wrong
  // answer, not an error) and throw a bare IndexOutOfBounds on missing
  // ones — validate arity like the built-in registry does
  private def exactArgs(name: String, n: Int, children: Seq[Expression]): Unit =
    if (children.length != n)
      throw new IllegalArgumentException(
        s"$name requires exactly $n argument(s), got ${children.length}")

  override def apply(extensions: SparkSessionExtensions): Unit = {
    // Optimizer rule: rewrite big×big range-band theta joins (BNLJ-bound)
    // to a binned equi-join — see graft.plans.BinnedRangeJoinRule.
    extensions.injectOptimizerRule(graft.plans.BinnedRangeJoinRule)
    // Planner strategy: whole-operator bounded-heap top-k per group —
    // see graft.plans.TopKPerGroup. The pruning rule restores column
    // pruning through the (otherwise opaque) custom node.
    extensions.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    extensions.injectOptimizerRule(_ => graft.plans.TopKColumnPruning)
    extensions.injectFunction((
      FunctionIdentifier("dot_f64"),
      new ExpressionInfo(classOf[DotProductF64].getName, "dot_f64"),
      (children: Seq[Expression]) => {
        exactArgs("dot_f64", 2, children)
        DotProductF64(
          Cast(children(0), ArrayType(DoubleType)),
          Cast(children(1), ArrayType(DoubleType)))
      }))
    extensions.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => {
        exactArgs("minhash_sig", 1, children)
        MinHashSig(
          Cast(children(0), ArrayType(org.apache.spark.sql.types.StringType)))
      }))
    extensions.injectFunction((
      FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
      (children: Seq[Expression]) => {
        exactArgs("simhash_sig", 1, children)
        SimHashSig(
          Cast(children(0), ArrayType(org.apache.spark.sql.types.StringType)))
      }))
  }
}
