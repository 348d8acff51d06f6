package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Parallelism floor for CPU-heavy per-row pipelines rooted at a narrow
  * scan (optimization guide §2.5, "input skew: one huge unsplittable
  * file … otherwise repartition immediately after the read").
  *
  * Why it exists: the fixture tables are single-file, single-row-group
  * parquet, so every leaf scan plans exactly ONE task regardless of
  * split config (a parquet row group is the atomic split unit). Every
  * per-doc/per-vector compute rooted at such a scan — shingling,
  * 128-perm MinHash, SimHash, hyperplane signatures, centroid argmax —
  * therefore ran serially on one core while the other 31 idled; the
  * round-17 profile showed the two importCorpus writes spending 2.9 s
  * EACH in one-task jobs at sf0.1.
  *
  * The floor is scale-adaptive, not a constant: it fires only when the
  * plan's own leaf parallelism is below the session's core count, so at
  * production scale (a corpus scan with thousands of row groups) it is
  * a structural no-op, and when it does fire the exchange it inserts
  * is by construction proportional to the SAME under-split input that
  * made it necessary (a one-task scan is small or unsplittable either
  * way; moving its bytes once is the documented trade for unserializing
  * the map work). Hash-partitioning on the caller's row key keeps the
  * assignment deterministic under task retry (guide §2.5 on rand-keyed
  * repartition) and spreads evenly — the key sets here (doc_id, vec_id)
  * are orders of magnitude larger than the partition count.
  */
object Spread {

  /** Per-task input floor for the spread target. Sizing rationale, from
    * the round-17 A/B at sf0.1: spreading the 594 KB corpus to all 32
    * cores made the SIGNING stage fast but regressed every warm
    * downstream consumer 1.3-1.6x (the cached signed frame inherits the
    * partitioning, so each tiny verify/band/agg stage pays 32 tasks of
    * scheduling+contention for kilobytes of work); an 8-way spread kept
    * ~all of the signing win and none of the downstream tax. 64 KB/task
    * encodes that measurement scale-adaptively — it is the
    * openCostInBytes idea with the floor shrunk by the ~50x per-byte
    * CPU density of shingle+128-perm signing over a plain columnar
    * scan (4 MB / 50 ≈ 80 KB), so a bigger corpus earns proportionally
    * more tasks up to the core count instead of re-tuning a constant.
    */
  private val BytesPerTask = 64L * 1024

  /** `df` hash-repartitioned on `key` to min(cores, estimated input
    * bytes / 64 KB), when its physical plan has fewer partitions than
    * that; `df` unchanged otherwise (in particular whenever the scan is
    * already parallel — the production case). Size comes from Catalyst
    * stats; frames with no usable estimate (e.g. checkpointed streaming
    * batches) default to the core count, which is right for the
    * admission paths that hand large batches here. Partition-count
    * probing never fails a query: any planning error falls back to the
    * identity. `spark.graft.spread.parts` overrides the target for
    * A/B measurement only.
    */
  def byKey(df: DataFrame, key: String): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val target = df.sparkSession.conf
      .get("spark.graft.spread.parts", "0").toInt match {
      case n if n > 0 => n
      case _ =>
        // size from the LEAF (scan) stats, not the frame's own post-
        // projection estimate: Catalyst scales a Project's sizeInBytes by
        // the column-width ratio, so a narrow projection of a CPU-dense
        // map's input (doc_id + token array) read ~3x under the bytes the
        // map actually chews through — measured at sf0.1 as 3-task
        // shingle/quality stages where the 64 KB/task law wanted 9. The
        // widest leaf is the honest proxy for per-row volume; filters
        // only ever make it conservative in the more-parallel direction.
        val bytes =
          try {
            val leaves = df.queryExecution.optimizedPlan.collectLeaves()
            if (leaves.isEmpty) BigInt(Long.MaxValue)
            else leaves.map(_.stats.sizeInBytes).max
          } catch { case _: Throwable => BigInt(Long.MaxValue) }
        val byBytes = (bytes / BytesPerTask).min(BigInt(cores)).toInt
        math.max(2, byBytes)
    }
    val parts =
      try df.queryExecution.toRdd.getNumPartitions
      catch { case _: Throwable => target }
    if (parts >= target) df else df.repartition(target, col(key))
  }

  /** Parallelism pin for CPU-DENSE candidate-pair verification (guide
    * §2.2: AQE coalescing sizes post-shuffle partitions by BYTES).
    * A candidate frame is two ids per row, so byte-based advisory
    * coalescing folds it into 1–4 partitions — but each row's downstream
    * cost is two shingle-array fetches plus an `array_intersect` over
    * ~hundreds of elements, 3 orders of magnitude per-byte heavier than
    * the scan AQE calibrates for. Measured (round-18 profile, sf0.1):
    * the admission in-batch verify ran 2.14 s in ONE task; the evict
    * lane's exact pre-filter verify 3.74 s in two.
    *
    * The fix is an explicit repartition count — user-specified counts
    * are exempt from AQE coalescing — at the width the session owner
    * configured for shuffles (`spark.sql.shuffle.partitions`, floored
    * at the core count): locally that restores the full core count; on
    * a cluster it is exactly the pre-AQE width the verify's exchange
    * would have had, so this pins away the byte-mis-sizing without
    * inventing a new constant.
    */
  def pairs(df: DataFrame, key: String): DataFrame = {
    val s = df.sparkSession
    val width = math.max(s.sparkContext.defaultParallelism,
      try s.conf.get("spark.sql.shuffle.partitions").toInt
      catch { case _: Throwable => 0 })
    df.repartition(width, col(key))
  }
}
