package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature over an `array<string>` shingle column
  * (SURVEY.md §2.7 X2 scale path).
  *
  * Replaces the higher-order-function formulation (transform over 128
  * permutations × aggregate over shingles), whose interpreted lambda
  * evaluation was the dominant cost of the near-dup pipeline at sf0.1
  * (~19M boxed expression evaluations). Here the whole signature is one
  * compiled loop: each shingle is xxhash64'd once, then 128 fused
  * multiply-add-min permutation passes run over the pre-hashed longs.
  *
  * h_p(x) = (a_p * h(x) + b_p) mod P, P = 1e9+7; a_p ∈ [1, 2^31],
  * b_p ∈ [0, P) from splitmix64 of the permutation index, so products
  * stay below 2^62 (no overflow). Signature length 128 = 32 LSH bands × 4
  * rows. CodegenFallback is deliberate: the eval body is already a tight
  * primitive loop, and the expression sits behind a projection boundary —
  * fallback costs one virtual call per row, not per element.
  */
case class MinHashSig(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val hs = new Array[Long](n)
    var m0 = 0
    var i = 0
    while (i < n) {
      // a null ELEMENT carries no shingle — skip it (the SQL surface casts
      // to array<string> with containsNull=true, so arbitrary caller input
      // can hold nulls; dereferencing would NPE the task)
      val s = arr.getUTF8String(i)
      if (s != null) {
        hs(m0) = Math.floorMod(
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L),
          MinHashSig.P)
        m0 += 1
      }
      i += 1
    }
    val sig = new Array[Long](MinHashSig.NumPerms)
    var p = 0
    while (p < MinHashSig.NumPerms) {
      val a = MinHashSig.PermA(p)
      val b = MinHashSig.PermB(p)
      var m = Long.MaxValue
      var j = 0
      while (j < m0) {
        val v = (a * hs(j) + b) % MinHashSig.P
        if (v < m) m = v
        j += 1
      }
      sig(p) = m
      p += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** The ONE splitmix64 every deterministic constant table derives from
  * (MinHash permutations, hyperplane components) — previously hand-copied
  * per file, where a drifted copy would silently break native-vs-oracle
  * parity. [[NGramHashes]] inlines the same finalizer in its hot loop by
  * design (documented there).
  */
private[graft] object SplitMix {
  def splitmix64(seed: Long): Long = {
    var x = seed + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
}

object MinHashSig {
  val NumPerms = 128
  val P = 1000000007L

  import SplitMix.splitmix64
  // a * h + b for h < P, a ≤ 2^31, b < P: max ≈ 2^61.9 — no Long overflow,
  // and all terms non-negative so % == floorMod.
  val PermA: Array[Long] =
    (0 until NumPerms).map(p => Math.floorMod(splitmix64(p.toLong), 2147483646L) + 1L).toArray
  val PermB: Array[Long] =
    (0 until NumPerms).map(p => Math.floorMod(splitmix64(p.toLong + 1000L), P)).toArray

  /** Column entry point: `minhashSig(shingles)` → `array<long>`[128]. */
  def apply(shingles: Column): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles)))
}
