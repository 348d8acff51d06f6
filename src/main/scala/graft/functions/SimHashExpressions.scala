package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native 64-bit SimHash over an `array<string>` token column
  * (SURVEY.md §2.7 X2 — the hamming-distance near-dup family).
  *
  * Replaces the triple-nested higher-order-function formulation
  * (aggregate over 64 bits × aggregate over tokens), which runs on the
  * interpreted lambda path — 64 boxed passes over the token-hash array
  * per document. Here each token is xxhash64'd once (seed 42, identical
  * to the `xxhash64` built-in the HOF twin calls) and a single compiled
  * loop accumulates all 64 signed bit counts per token; bit k of the
  * result is set when its signed count is positive. Parity with the HOF
  * twin is pinned in LlmOpsSpec.
  *
  * Same CodegenFallback rationale as [[MinHashSig]]: the eval body is a
  * tight primitive loop, so fallback costs one virtual call per row, not
  * per element.
  */
case class SimHashSig(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      // null tokens carry no vote — skip, don't NPE (the SQL surface
      // admits array<string> with containsNull=true)
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        var k = 0
        while (k < 64) {
          // odd <=> lowest bit set, for any sign — matches the HOF twin's
          // shiftright(h, k) % 2 != 0 test
          if (((h >> k) & 1L) == 1L) counts(k) += 1 else counts(k) -= 1
          k += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) {
      if (counts(k) > 0) sig |= (1L << k)
      k += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  /** Column entry point: `SimHashSig(tokens)` → `long`. */
  def apply(tokens: Column): Column =
    ColumnBridge.column(SimHashSig(ColumnBridge.expression(tokens)))
}
