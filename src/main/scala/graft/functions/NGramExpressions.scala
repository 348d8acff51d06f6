package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native distinct rolling n-gram hashes over an `array<string>` token
  * column (SURVEY.md §2.7 X7 — decontamination's overlap key).
  *
  * The HOF formulation (`transform(sequence(...), i -> xxhash64(
  * concat_ws(' ', element_at(toks, i), ...)))`) pays the interpreted
  * lambda path per position AND materializes every n-gram string —
  * profiled at ~8.5 s for the sf0.1 decontamination join, the same trap
  * the MinHash pipeline hit in round 1. Here each token is hashed once
  * (XXH64 over its bytes), every window combines n pre-hashed longs
  * with an order-sensitive polynomial (FNV-style multiplier) finalized
  * by a splitmix64 mix, and within-doc duplicates are dropped in the
  * same pass. One compiled loop, no per-window strings.
  *
  * The hash keys a Spark⋈Spark overlap join, so it does NOT need to be
  * engine-portable (the DuckDB twin joins on the n-gram text itself);
  * it only needs determinism and a negligible collision rate — 64-bit
  * output over ≤ millions of distinct n-grams per corpus split.
  * CodegenFallback for the [[MinHashSig]] reason: the body is already a
  * tight primitive loop behind a projection boundary.
  */
case class NGramHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val rawCnt = arr.numElements()
    val hs = new Array[Long](rawCnt)
    // null tokens are compacted away (an n-gram spanning a nonexistent
    // token is ill-defined, and dereferencing one would NPE the task)
    var cnt = 0
    var i = 0
    while (i < rawCnt) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        hs(cnt) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        cnt += 1
      }
      i += 1
    }
    if (cnt < n) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= cnt - n) {
      var acc = 0xcbf29ce484222325L
      var j = 0
      while (j < n) {
        acc = acc * 0x100000001b3L + hs(i + j)
        j += 1
      }
      // splitmix64 finalizer — spreads the polynomial accumulator
      var x = acc + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      seen.add(x ^ (x >>> 31))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): NGramHashes =
    copy(child = newChild)
}

object NGramHashes {
  /** Column entry point: `NGramHashes(tokens, 8)` → distinct window
    * hashes as `array<long>`.
    */
  def apply(tokens: Column, n: Int): Column =
    ColumnBridge.column(NGramHashes(ColumnBridge.expression(tokens), n))
}
