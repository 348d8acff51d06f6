package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 dev harness: the BandStore admission stage timers (VERDICT
  * r10 item 4 — steady-state batch cost 8.2–9.4 s at the 50k stress
  * scale; the target is ≤5 s with the flat-growth property kept).
  * Replicates the StressBench dedup10x admission drive — sf0.1
  * documents ×10 admitted as 10 sequential batches — with
  * `spark.graft.debug.timing` on for the final batches so the stage
  * split of the steady state is visible.
  *
  * The `signing` mode backs the COVERAGE.md §2.8 claim that the
  * CodegenFallback boundary on the signing expressions is immaterial:
  * it times a pure-codegen scan+hash of the same column (an upper bound
  * on everything the fallback boundary could cost — the whole row
  * pipeline outside the loop body) against the native MinHashSig /
  * SimHashSig evaluations, best-of-3 each.
  *
  * Usage: runMain graft.Probe11 <sfDir> admit|signing
  */
object Probe11 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mode = if (args.length > 1) args(1) else "admit"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(e => new graft.functions.GraftExtensions()(e))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (mode == "signing") { signingSplit(spark, sfDir); spark.stop(); return }

    // optional [workDir] [startBatch] [endBatch]: resume the loop over an
    // EXISTING store from a fresh JVM — store growth and JVM age are
    // co-linear inside one loop, and the split-run is what de-confounds
    // them (same store state, new process: matching times = store-size
    // cost, a reset = JVM aging)
    val work = if (args.length > 2) args(2)
      else java.nio.file.Files.createTempDirectory("probe11").toString
    val startBatch = if (args.length > 3) args(3).toInt else 0
    val endBatch = if (args.length > 4) args(4).toInt else 10
    // ×10 corpus with disjoint ids AND replica-prefixed tokens — the full
    // StressBench replicate discipline. The first recording shifted only
    // the ids, so every replica was an EXACT duplicate of the base
    // corpus: batches 1–9 were wholly dropped, the store never grew past
    // one batch, and the loop's "flat across a growing store" reading
    // measured a store that wasn't growing (found in the r12 admission
    // investigation — the in-run climb is store-size cost, which this
    // probe's stage split now actually exhibits).
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val maxId = docs0.agg(max(col("doc_id"))).head.getLong(0) + 1
    val big = s"$work/documents.parquet"
    if (startBatch == 0) (0 until 10)
      .map { i =>
        val prefixed =
          if (i == 0) col("text")
          else expr(s"array_join(transform(split(text, ' '), t -> concat('r$i', t)), ' ')")
        docs0.select((col("doc_id") + lit(i * maxId)).as("doc_id"),
          prefixed.as("text"), col("source"), col("lang"), col("n_chars"))
      }
      .reduce(_ unionByName _)
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(big)

    val store = s"$work/admstore"
    val out = s"$work/admout"
    val all = spark.read.parquet(big).persist()
    val per = all.count() / 10
    // stage-time EVERY batch: the climb lives in batches 2-7 (the
    // approach to steady state), not just the steady tail
    spark.conf.set("spark.graft.debug.timing", "true")
    // SPARK_GRAFT_SEQWRITES=1 serializes the three store writes so their
    // timings don't absorb each other's scheduler contention
    if (sys.env.contains("SPARK_GRAFT_SEQWRITES"))
      spark.conf.set("spark.graft.debug.sequentialWrites", "true")
    val secs = (startBatch until endBatch).map { b =>
      val batch = all.filter(col("doc_id") >= b * per && col("doc_id") < (b + 1) * per)
      val t0 = System.nanoTime()
      graft.streaming.BandStore.admitBatch(batch, b.toLong, store, out)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe11] batch $b total $s%6.2f s")
      s
    }
    val tail3 = secs.takeRight(3)
    println(f"[probe11] mean of last ${tail3.length} run batches: ${tail3.sum / tail3.length}%.2f s")
    all.unpersist()
    spark.stop()
  }

  private def signingSplit(spark: SparkSession, sfDir: String): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val n = docs.count()
    def best3(name: String)(body: => Unit): Double = {
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[probe11] $name%-28s $t%6.3f s  (${t * 1e6 / n}%.1f us/doc, n=$n)")
      t
    }
    // pure-codegen scan + hash of the same column: an UPPER bound on the
    // whole row pipeline outside the signing loop body — i.e. on
    // everything the CodegenFallback boundary could possibly cost
    // aggregates CONSUME the computed column — count(lit(1)) would let
    // column pruning delete the very expression under measurement
    val base = best3("codegen scan+xxhash64") {
      docs.select(xxhash64(col("text")).as("h")).agg(expr("bit_xor(h)")).head }
    val mh = best3("MinHashSig (fallback)") {
      docs.select(graft.functions.MinHashSig(
          graft.operators.Dedup.shingles(col("text"))).as("sig"))
        .agg(sum(size(col("sig")))).head }
    val sh = best3("SimHashSig (fallback)") {
      docs.select(graft.operators.Dedup.simhashSig.as("sig"))
        .agg(expr("bit_xor(sig)")).head }
    println(f"[probe11] boundary bound: ${100.0 * base / mh}%.1f%% of minhash, " +
      f"${100.0 * base / sh}%.1f%% of simhash signing time")
  }
}
