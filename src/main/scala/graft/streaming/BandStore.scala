package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Bucketed MinHash signature/band store backing the streaming dedup
  * admission loop ([[Streams.dedupAdmitSink]]) — the persistent state of
  * the production corpus-dedup pipeline (SURVEY.md §2.7 X2g / T11).
  *
  * Layout under `storeDir`:
  *   - `bands/`  — (band, bh, doc_id), partitioned by
  *     (`__batch`, `__bb` = pmod(bh, [[BandBuckets]])). A batch probe
  *     computes its own band hashes, collects the ≤ [[BandBuckets]]
  *     distinct `__bb` values it touches (driver-side bounded by the
  *     bucket count, never the data), and reads ONLY those partitions —
  *     partition pruning at the scan, the same discipline as
  *     [[graft.sources.Sinks.mergeIntoStore]]'s 16-bucket upsert store.
  *     Per-batch probe cost is O(matching buckets), not O(corpus): a
  *     band-hash equi-probe is exactly what parquet min/max stats can
  *     NOT prune, so the bucketing must be in the layout.
  *   - `sigs/`   — (doc_id, sh, sig), partitioned by
  *     (`__batch`, `__db` = pmod(doc_id, [[SigBuckets]])). Exact-verify
  *     reads only the buckets holding candidate peers (≤ [[SigBuckets]]
  *     driver-side values).
  *
  * Idempotence: every write is a dynamic-partition OVERWRITE of the
  * batch's own `__batch=<id>` partitions, and every read EXCLUDES
  * `__batch = <current id>` — so a checkpoint replay (crash after any
  * subset of the three writes, before the commit) recomputes the exact
  * same admission decision against the exact same visible store and
  * overwrites its own partitions with identical bytes. No blind appends.
  *
  * At 100 TB the bucket counts scale up (thousands), the store is the
  * precomputed ~1 KB/doc signature state, and the corpus text is never
  * re-read — admission cost per batch is bounded by the batch and its
  * candidates.
  */
object BandStore {

  /** Band-hash bucket count of `bands/`. 64 at fixture scale. */
  val BandBuckets = 64

  /** doc_id bucket count of `sigs/`. 16 at fixture scale. */
  val SigBuckets = 16

  def bandsDir(storeDir: String): String = s"$storeDir/bands"
  def sigsDir(storeDir: String): String = s"$storeDir/sigs"

  /** 32 bands × 4 rows over the 128-perm signature — identical banding to
    * [[Dedup.x2MinHashLsh]] / [[Dedup.x2IncrementalLsh]], so a J=0.8 pair
    * collides in ≥1 band with p ≈ 1−3e−9 and LSH+verify equals exact.
    */
  private val bandExpr =
    "transform(sequence(0, 31), b -> xxhash64(concat_ws(',', slice(sig, b * 4 + 1, 4))))"

  /** Exploded (id, band, bh) table of a signed frame (`doc_id`, `sig`). */
  private[graft] def explodeBands(sig: DataFrame, idAs: String): DataFrame =
    sig.select(col("doc_id").as(idAs),
      posexplode(expr(bandExpr)).as(Seq("band", "bh")))

  /** Shingle + 128-perm sign a document frame (`doc_id`, `text`). Docs
    * under 3 tokens carry no shingles and are absent (admitted by
    * construction at the caller).
    */
  private[graft] def signDocs(batch: DataFrame): DataFrame =
    batch
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      .withColumn("sig", Dedup.minhashSig)

  /** True when `dir` holds at least one committed `__batch=` partition. */
  private def hasBatches(spark: SparkSession, dir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(path) && fs.listStatus(path)
      .exists(st => st.isDirectory && st.getPath.getName.startsWith("__batch="))
  }

  private def overwriteBatchPartitions(df: DataFrame, batchId: Long,
                                       extraBucket: Option[(String, org.apache.spark.sql.Column)],
                                       dir: String): Unit = {
    val stamped = df.withColumn("__batch", lit(batchId))
    val (partCols, withBuckets) = extraBucket match {
      case Some((name, c)) => (Seq("__batch", name), stamped.withColumn(name, c))
      case None => (Seq("__batch"), stamped)
    }
    withBuckets.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCols: _*)
      .parquet(dir)
  }

  /** Batch id of the compacted base partition: never a live micro-batch
    * id (those are ≥ 0), so probes' `__batch =!= currentBatchId`
    * replay-exclusion can never exclude compacted history.
    */
  val BaseBatch: Long = -1L

  /** Offline maintenance: rewrite the store's per-batch partition trees
    * into a single [[BaseBatch]] partition per bucket. Every micro-batch
    * adds up to [[BandBuckets]] `(__batch, __bb)` leaf directories —
    * after thousands of batches the file LISTING, not the data, becomes
    * the probe's cost (the small-files tax of high-frequency sinks, same
    * problem [[graft.sources.Sinks.compact]] solves for flat dirs).
    * Compaction restores O(buckets) listing while preserving bucketing,
    * so probe pruning is untouched.
    *
    * Run it like any maintenance job: between drains, with the stream's
    * checkpoint fully committed. (A replay of a pre-compaction batch
    * would re-append that batch's partitions alongside the base copy —
    * the admission decision stays correct because candidate pairs are
    * `distinct()`ed, but the store would carry duplicate signature rows
    * until the next compaction. With a committed checkpoint the engine
    * never replays those batches.)
    *
    * Staged to a temp sibling and swapped with two renames, so a reader
    * sees the old or the new layout, never a mix.
    */
  def compactStore(spark: SparkSession, storeDir: String): Unit = {
    def rewrite(dir: String, bucketCol: String): Unit = {
      val path = new org.apache.hadoop.fs.Path(dir)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(path)) return
      val staging = new org.apache.hadoop.fs.Path(
        path.getParent, s".${path.getName}-compact-${java.util.UUID.randomUUID}")
      val old = new org.apache.hadoop.fs.Path(
        path.getParent, s".${path.getName}-old-${java.util.UUID.randomUUID}")
      spark.read.parquet(dir)
        .withColumn("__batch", lit(BaseBatch))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("__batch", bucketCol)
        .parquet(staging.toString)
      require(fs.rename(path, old), s"compactStore: could not move $path aside")
      require(fs.rename(staging, path), s"compactStore: could not swap $staging in")
      fs.delete(old, true)
    }
    rewrite(bandsDir(storeDir), "__bb")
    rewrite(sigsDir(storeDir), "__db")
  }

  /** The pruned probe scan of `bands/` for one batch: only partitions in
    * `touchedBb`, never rows of `batchId` itself (replay safety). Public
    * to let the plan pin assert partition pruning on the exact scan the
    * admission step runs.
    */
  private[graft] def probeScan(spark: SparkSession, storeDir: String,
                               touchedBb: Seq[Int], batchId: Long): DataFrame =
    spark.read.parquet(bandsDir(storeDir))
      .filter(col("__bb").isin(touchedBb: _*) && col("__batch") =!= batchId)
      .select(col("band"), col("bh"), col("doc_id").as("peer_id"))

  /** One admission step — the foreachBatch body of
    * [[Streams.dedupAdmitSink]], public as the batch/production entry
    * point (the batch form of the loop [[Dedup.x2IncrementalLsh]] is the
    * oracle twin of).
    *
    * Per batch: (1) sign batch docs (narrow map over the batch only);
    * (2) candidates vs the store via the bucket-pruned band probe, plus
    * within-batch band collisions; (3) exact Jaccard ≥ 0.8 verification —
    * store-peer shingles read only from the `sigs/` buckets holding
    * candidate peers; (4) within-batch vetoes resolved to the GREEDY
    * min-doc_id admission fixpoint: a doc is dropped only by a smaller
    * peer that itself survives (store-dropped or batch-dropped docs
    * cannot veto — on a near-dup chain A~B~C with A≁C, B drops and C is
    * ADMITTED, exactly what sequential min-id-first admission yields);
    * (5) survivors overwrite their `__batch` partitions in
    * `admittedDir`, `sigs/` and `bands/`.
    */
  def admitBatch(batch: DataFrame, batchId: Long, storeDir: String,
                 admittedDir: String): Unit = {
    val spark = batch.sparkSession
    val sig = signDocs(batch).persist()
    val batchBands = explodeBands(sig, "batch_id").persist()
    val storeExists = hasBatches(spark, bandsDir(storeDir))

    def emptyPairs(aCol: String, bCol: String): DataFrame =
      spark.range(0).select(col("id").as(aCol), col("id").as(bCol))

    // (2a) store candidates through the bucket-pruned probe
    val candVsStore =
      if (!storeExists) emptyPairs("batch_id", "peer_id")
      else {
        val touched = batchBands
          .select(pmod(col("bh"), lit(BandBuckets)).cast("int").as("__bb"))
          .distinct().collect().map(_.getInt(0)).toSeq // ≤ BandBuckets values
        if (touched.isEmpty) emptyPairs("batch_id", "peer_id")
        else probeScan(spark, storeDir, touched, batchId)
          .join(batchBands, Seq("band", "bh"))
          // drop self-pairs: impossible in normal operation (reads exclude
          // __batch = batchId), but after compactStore rewrites rows into
          // __batch = BaseBatch, a checkpoint replay of a pre-compaction
          // batch would see its own docs as store peers and self-veto them
          // (Jaccard 1.0), silently un-admitting previously admitted docs
          .filter(col("peer_id") =!= col("batch_id"))
          .select(col("batch_id"), col("peer_id"))
          .distinct()
      }
    // (2b) within-batch collisions: only a smaller doc_id can veto
    val candInBatch = batchBands.as("a")
      .join(batchBands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
          && col("b.batch_id") < col("a.batch_id"))
      .select(col("a.batch_id"), col("b.batch_id").as("peer_id"))
      .distinct()

    // (3) exact verification at Jaccard ≥ 0.8
    def verified(cand: DataFrame, peerSh: DataFrame): DataFrame =
      cand
        .join(sig.select(col("doc_id"), col("sh").as("sh_b")),
          col("batch_id") === col("doc_id")).drop("doc_id")
        .join(peerSh, col("peer_id") === col("doc_id")).drop("doc_id")
        .withColumn("c", size(array_intersect(col("sh_b"), col("sh_p"))).cast("double"))
        .filter(round(col("c") / (size(col("sh_b")) + size(col("sh_p")) - col("c")), 6) >= 0.8)
        .select(col("batch_id"), col("peer_id"))

    val storeDropped =
      if (!storeExists) emptyPairs("doc_id", "ignore").select(col("doc_id"))
      else {
        // candidate peers' shingles: read only the sigs/ buckets holding
        // them — ≤ SigBuckets driver-side values, the Sinks.mergeIntoStore
        // touched-bucket discipline
        val peerBuckets = candVsStore
          .select(pmod(col("peer_id"), lit(SigBuckets)).cast("int").as("__db"))
          .distinct().collect().map(_.getInt(0)).toSeq
        if (peerBuckets.isEmpty) emptyPairs("doc_id", "ignore").select(col("doc_id"))
        else {
          val peerSh = spark.read.parquet(sigsDir(storeDir))
            .filter(col("__db").isin(peerBuckets: _*) && col("__batch") =!= batchId)
            .select(col("doc_id"), col("sh").as("sh_p"))
          verified(candVsStore, peerSh).select(col("batch_id").as("doc_id")).distinct()
        }
      }

    // (4) greedy min-id admission within the batch: iterate
    //     dropped ← {d | ∃ verified pair (p, d), p < d, p not dropped,
    //                    p not store-dropped}
    //     to fixpoint. The veto graph ordered by doc_id is a DAG, so the
    //     iteration fixes nodes bottom-up in ≤ chain-depth rounds; each
    //     round is one join over the (tiny, lineage-truncated) verified
    //     in-batch pair set, and convergence is checked by symmetric
    //     difference. The cap is a backstop for pathological chain depth;
    //     hitting it keeps the conservative (over-dropping) last iterate,
    //     deterministically.
    // the verified pair graph is tiny (near-dups are sparse): one
    // partition keeps every fixpoint round at a handful of tasks
    val pairsLive = verified(candInBatch, sig.select(col("doc_id"), col("sh").as("sh_p")))
      .join(storeDropped.withColumnRenamed("doc_id", "peer_id"), Seq("peer_id"), "left_anti")
      .coalesce(1)
      .localCheckpoint()
    var batchDropped = pairsLive.select(col("batch_id").as("doc_id")).distinct()
      .localCheckpoint()
    // fast path: most production batches carry no within-batch
    // near-dups — skip the fixpoint machinery entirely
    var converged = batchDropped.isEmpty
    var rounds = 0
    while (!converged && rounds < 32) {
      val next = pairsLive
        .join(batchDropped.withColumnRenamed("doc_id", "peer_id"), Seq("peer_id"), "left_anti")
        .select(col("batch_id").as("doc_id")).distinct()
        .localCheckpoint()
      converged = next.exceptAll(batchDropped).isEmpty && batchDropped.exceptAll(next).isEmpty
      batchDropped = next
      rounds += 1
    }

    val dropped = storeDropped.unionByName(batchDropped).distinct()
    val admitted = batch.join(dropped, Seq("doc_id"), "left_anti").persist()

    // (5) idempotent writes: dynamic overwrite of this batch's partitions
    val admittedSig = sig.join(admitted.select(col("doc_id")), Seq("doc_id"), "left_semi")
    overwriteBatchPartitions(admittedSig, batchId,
      Some(("__db", pmod(col("doc_id"), lit(SigBuckets)).cast("int"))), sigsDir(storeDir))
    overwriteBatchPartitions(
      explodeBands(admittedSig, "doc_id"), batchId,
      Some(("__bb", pmod(col("bh"), lit(BandBuckets)).cast("int"))), bandsDir(storeDir))
    overwriteBatchPartitions(admitted, batchId, None, admittedDir)
    sig.unpersist()
    batchBands.unpersist()
    admitted.unpersist()
  }
}
