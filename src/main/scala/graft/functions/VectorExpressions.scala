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

/** Column-level entry points for the native vector expressions. */
object VectorFunctions {
  /** `dot_f64(a, b)` as a Column — usable from any session (no
    * registration needed for the DataFrame API path).
    */
  def dotF64(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductF64(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))
}

/** SQL-surface registration (`SELECT dot_f64(a, b) ...`) via the public
  * extensions mechanism: `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends SparkSessionExtensionsProvider {
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
      (children: Seq[Expression]) => DotProductF64(
        Cast(children(0), ArrayType(DoubleType)),
        Cast(children(1), ArrayType(DoubleType)))))
    extensions.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => MinHashSig(
        Cast(children(0), ArrayType(org.apache.spark.sql.types.StringType)))))
    extensions.injectFunction((
      FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
      (children: Seq[Expression]) => SimHashSig(
        Cast(children(0), ArrayType(org.apache.spark.sql.types.StringType)))))
  }
}
