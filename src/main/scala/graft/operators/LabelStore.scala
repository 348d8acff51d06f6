package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** [EXT] Materialized dup-cluster LABEL STORE — the
  * [[graft.streaming.BandStore]] publication discipline applied to the
  * output of [[Dedup.x2DupClusters]] (VERDICT r7 item 3).
  *
  * Why it exists: the cluster-label pipeline (signatures → bands →
  * candidate pairs → fixpoint propagation) is a BUILD ARTIFACT, not a
  * per-query subplan. Round 7 shipped three consumers
  * (`x2_dup_clusters`, `x2_dedup_keep`, `dag_corpus_build`) that each
  * recomputed it from the corpus text; at 100 TB that is three full
  * LSH passes for one logical table. The store turns the pipeline into
  * one build + many cheap reads: the label table is dup-cluster-sized
  * (orders of magnitude smaller than the corpus), so consumers pay a
  * parquet scan of a few MB where they paid a corpus-wide pipeline.
  *
  * Layout: `storeDir/gen=<k>__n=<count>__fp=<digest>/` — one directory
  * per GENERATION, the labels parquet inside, the corpus fingerprint
  * (row count + order-insensitive 64-bit digest) encoded in the
  * directory NAME so data and validity metadata publish in the same
  * atomic rename. Build writes to a dot-prefixed staging dir (invisible
  * to listings), then one `rename` publishes; generations strictly
  * increase, and after publish all but the newest two are retired by
  * another atomic dot-rename (the BandStore retirement idiom: a reader
  * that resolved the PREVIOUS latest generation before a concurrent
  * rebuild still scans files that exist; only a reader two rebuilds
  * stale can hit a retired path, and resolving again at call time
  * recovers — the same idempotent-retry contract as band-store
  * admission under compaction).
  *
  * Staleness: [[ensureCurrent]] re-fingerprints the corpus (one
  * map-side-combinable aggregate — count + bit_xor of per-doc hashes,
  * insensitive to row order and partitioning) and rebuilds only on
  * mismatch, so an append/rewrite of the corpus invalidates the store
  * by measurement, never by convention.
  */
object LabelStore {

  /** Per-doc digest frame (doc_id, h) — the unit the corpus fingerprint
    * aggregates over AND the append-detection key of the incremental
    * path, so the two validity checks cannot diverge.
    */
  private[graft] def digests(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"), xxhash64(col("doc_id"), col("text")).as("h"))

  /** (row count, order-insensitive digest) of the corpus the labels
    * derive from. bit_xor over per-doc xxhash64(doc_id, text): one
    * narrow scan, no shuffle beyond the scalar aggregate, and XOR
    * cannot overflow under ANSI mode.
    */
  private[graft] def fingerprint(s: SparkSession, dir: String): (Long, Long) =
    fingerprintOf(digests(Tables.documents(s, dir)))

  private def fingerprintOf(dg: DataFrame): (Long, Long) = {
    val r = dg.agg(count(lit(1)), expr("bit_xor(h)")).head
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Stage timer for maintenance profiling, off unless
    * `spark.graft.debug.timing=true` (Probe10's label modes set it).
    */
  private def timed[A](s: SparkSession, name: String)(f: => A): A =
    if (s.conf.get("spark.graft.debug.timing", "false") != "true") f
    else {
      val t0 = System.nanoTime(); val r = f
      println(f"[label-timing] $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

  private def settleQuietly(f: scala.concurrent.Future[_]): Unit =
    StoreDirs.settleQuietly(f)

  private case class Gen(k: Long, n: Long, fp: Long, path: Path)

  private def fsOf(s: SparkSession, p: Path) =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  private val GenName = """gen=(\d+)__n=(\d+)__fp=([0-9a-f]+)""".r

  private def listGens(s: SparkSession, storeDir: String): Seq[Gen] = {
    val root = new Path(storeDir)
    val fs = fsOf(s, root)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.collect {
      case st if st.isDirectory => st.getPath.getName match {
        case GenName(k, n, fp) =>
          Some(Gen(k.toLong, n.toLong, java.lang.Long.parseUnsignedLong(fp, 16), st.getPath))
        case _ => None
      }
    }.flatten.sortBy(_.k)
  }

  // ----------------------------------------------------------------
  // Signature/band INDEX — what makes the incremental append path
  // possible. The admission BandStore cannot serve label maintenance:
  // it stores only admitted survivors, and a new doc near-dup of a
  // DROPPED cluster member must still merge into that member's cluster
  // (in the full rebuild the new doc's edge reaches the dropped doc and
  // through it the whole component). So the label store keeps its own
  // per-doc state for the WHOLE corpus — the standard "materialize
  // signatures" checkpoint (~1 KB/doc) of a production MinHash
  // pipeline:
  //   index/digests/    __batch=<gen>/            (doc_id, h)
  //   index/sigs/       __batch=<gen>/__db=<b>/   (doc_id, sh)
  //   index/bands/      __batch=<gen>/__bb=<b>/   (band, bh, doc_id)
  //   index/tombstones/ __batch=<gen>/            (doc_id)
  // sigs/bands carry the BandStore bucketing so an append's probe and
  // verify read only the buckets its band hashes / candidate peers
  // touch — per-append cost is bounded by the batch and its
  // candidates, never O(corpus). Deletes never rewrite index rows in
  // place (a live generation still scans them): they land a TOMBSTONE
  // batch that every index read masks (batch-aware, see maskDead), and
  // the full rebuild compacts the dead rows away.
  // Write order is labels-first, index-second, and within the index
  // digests LAST: a crash mid-maintenance leaves digest drift that the
  // next call re-classifies (appended = corpus digests − live index
  // digests), and the re-merge is idempotent — contracted endpoints of
  // already-labeled docs collapse to their reps, so replayed edges
  // change nothing.
  // ----------------------------------------------------------------

  private val BandBuckets = 64
  private val SigBuckets = 16

  /** The index's bucket geometry — conf-driven at store creation
    * (shared confs with [[graft.streaming.BandStore]]: the same
    * 100 TB sizing applies), recorded in `<storeDir>/.geometry`, fixed
    * for the store's lifetime, legacy stores pinned to the 64/16
    * defaults their index rows were written under. See
    * [[StoreDirs.ensureGeometry]].
    */
  private def geometry(s: SparkSession, storeDir: String): (Int, Int) = {
    val root = new Path(storeDir)
    val fs = fsOf(s, root)
    val g = StoreDirs.ensureGeometry(fs, storeDir,
      legacy = StoreDirs.hasBatchDirs(fs, new Path(sigsIdx(storeDir))) ||
        StoreDirs.hasBatchDirs(fs, new Path(bandsIdx(storeDir))) ||
        StoreDirs.hasBatchDirs(fs, new Path(digestsIdx(storeDir))),
      defaults = Seq("bandBuckets" -> BandBuckets, "sigBuckets" -> SigBuckets),
      confValues = Seq(
        "bandBuckets" -> s.conf.get(graft.streaming.BandStore.BandBucketsConf, BandBuckets.toString).toInt,
        "sigBuckets" -> s.conf.get(graft.streaming.BandStore.SigBucketsConf, SigBuckets.toString).toInt))
    (g("bandBuckets"), g("sigBuckets"))
  }

  private def digestsIdx(storeDir: String) = s"$storeDir/index/digests"
  private def sigsIdx(storeDir: String) = s"$storeDir/index/sigs"
  private def bandsIdx(storeDir: String) = s"$storeDir/index/bands"
  private def tombstonesIdx(storeDir: String) = s"$storeDir/index/tombstones"

  /** Tombstoned doc ids visible at generation `upTo` —
    * `index/tombstones/__batch=<gen>/ (doc_id)`. A delete lands its
    * tombstone batch NUMBERED with the generation it publishes with and
    * writes it BEFORE the publish rename, so readers gate on
    * `__batch <= <published gen>`: a tombstone from a crashed
    * (never-published) delete attempt stays invisible, and the retry —
    * whose classification therefore still sees the deleted docs in the
    * index — re-runs the delete path and idempotently overwrites the
    * same batch.
    */
  private def tombstones(s: SparkSession, storeDir: String,
                         upTo: Long): Option[DataFrame] = {
    val p = new Path(tombstonesIdx(storeDir))
    if (!StoreDirs.hasBatchDirs(fsOf(s, p), p)) None
    else Some(s.read.parquet(tombstonesIdx(storeDir))
      .filter(col("__batch") <= upTo)
      .select(col("doc_id").as("__ts_id"), col("__batch").as("__ts_b")))
  }

  /** Drop index rows a tombstone masks: a row is dead iff some visible
    * tombstone for its doc_id is at least as new as the row's batch —
    * batch-aware so a doc RE-ADDED after deletion (its new rows land in
    * a batch after the tombstone's) stays live. Tombstone volume is
    * bounded by deletes since the last full rebuild (the compaction
    * trigger caps the dead fraction), so the anti-join's build side
    * stays small.
    */
  private def maskDead(df: DataFrame, ts: Option[DataFrame]): DataFrame =
    ts.fold(df)(t => df.join(t,
      df("doc_id") === t("__ts_id") && t("__ts_b") >= df("__batch"), "left_anti"))

  private def writeTombstones(deleted: DataFrame, gen: Long, storeDir: String): Unit =
    // direct write into the (unpublished) batch dir — the writeOne
    // append discipline; the dynamic-overwrite committer's
    // stage-and-move was pure per-write overhead
    writeOne(deleted.select(col("doc_id")).coalesce(8), gen, Seq.empty,
      tombstonesIdx(storeDir), replaceAll = false)

  /** (doc_id, sh, sig) of the signable subset of a corpus frame —
    * identical shingling/signing to [[Dedup.x2MinHashLsh]].
    */
  private def signed(corpus: DataFrame): DataFrame =
    // Spread.byKey before shingling/signing (guide §2.5): the fixture
    // corpus scan plans one task, serializing the index build's
    // heaviest map; no-op at production scan parallelism
    graft.engine.Spread.byKey(
        corpus.filter(size(split(col("text"), " ")) >= 3), "doc_id")
      .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      .withColumn("sig", Dedup.minhashSig)

  private def bandsOf(sig: DataFrame): DataFrame =
    sig.select(col("doc_id"), posexplode(expr(Dedup.bandSql)).as(Seq("band", "bh")))

  /** Exact Jaccard ≥ 0.8 over (sh_a, sh_b) — identical arithmetic to
    * [[Dedup.x2MinHashLsh]] so maintained labels hash-match its oracle.
    */
  private def jaccardOk: org.apache.spark.sql.Column = {
    val c = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    round(c / (size(col("sh_a")) + size(col("sh_b")) - c), 6) >= 0.8
  }

  /** Write the index slice for one generation. `replaceAll` (full
    * rebuild) statically overwrites the whole index; an append
    * dynamically overwrites only its own `__batch` partitions
    * (idempotent under retry, the BandStore discipline).
    */
  /** Row-count threshold under which a delta's index slice is written as
    * ONE task per dataset instead of a bucket-repartition shuffle: a
    * takedown/append-sized delta produces one file per touched bucket
    * dir either way, and the shuffle is pure overhead.
    */
  private val SmallDeltaRows = 100000L

  /** One index dataset write. `replaceAll` statically overwrites the
    * whole dataset. An append writes DIRECTLY into its own
    * `__batch=<gen>` directory (the partition value comes from the dir
    * name at read time, exactly as a partitionBy write lands it),
    * deleting any crashed earlier attempt's dir first — the
    * [[IvfStore]] writeBatch discipline. The batch is always
    * unpublished until the generation rename, so no reader can see the
    * in-flight dir, and the delete-first makes retries idempotent
    * without the dynamic-partition-overwrite committer's stage-and-move
    * machinery (measured ~2 s per small write against the 64-bucket
    * bands dir).
    */
  private def writeOne(df: DataFrame, gen: Long, parts: Seq[String],
                       dir: String, replaceAll: Boolean): Unit =
    if (replaceAll)
      df.withColumn("__batch", lit(gen))
        .write.mode(SaveMode.Overwrite)
        .partitionBy(("__batch" +: parts): _*).parquet(dir)
    else {
      val batchDir = new Path(dir, s"__batch=$gen")
      val fs = fsOf(df.sparkSession, batchDir)
      if (fs.exists(batchDir)) fs.delete(batchDir, true)
      df.write.mode(SaveMode.Overwrite)
        .partitionBy(parts: _*).parquet(batchDir.toString)
    }

  /** The sigs + bands halves of the index slice for one generation —
    * CONCURRENT (independent datasets, both derived from the persisted
    * sig frame), and safe to run while the maintenance chain is still
    * probing the PREVIOUS batches (the caller pins the chain's index
    * listings first). Deltas repartition BY THE BUCKET COLUMN even when
    * small: a delta touches up to all 64 band buckets, and a
    * single-task write creates those files serially (measured
    * 1.7–3.6 s); hashing the tiny delta across tasks writes them in
    * parallel for a trivial shuffle. `replaceAll` (full rebuild)
    * statically overwrites the whole dataset; an append dynamically
    * overwrites only its own `__batch` partitions (idempotent under
    * retry, the BandStore discipline).
    */
  private def writeSigsBands(sig: DataFrame, gen: Long, storeDir: String,
                             replaceAll: Boolean): Unit = {
    val s = sig.sparkSession
    val (gbb, gdb) = geometry(s, storeDir)
    val sigsDf = sig.select(col("doc_id"), col("sh"))
      .withColumn("__db", pmod(col("doc_id"), lit(gdb)).cast("int"))
    val bandsDf = bandsOf(sig).select(col("band"), col("bh"), col("doc_id"))
      .withColumn("__bb", pmod(col("bh"), lit(gbb)).cast("int"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(Future.sequence(Seq(
      // EXPLICIT partition counts: pmod makes bucket == shuffle
      // partition, so every task writes exactly one file — and a
      // user-specified count is exempt from AQE coalescing, which would
      // otherwise fold the tiny shuffle into ONE task that creates all
      // 64 bucket files serially (measured ~2 s per append)
      Future(timed(s, "  idx-sigs") {
        writeOne(sigsDf.repartition(gdb, col("__db")), gen,
          Seq("__db"), sigsIdx(storeDir), replaceAll) }),
      Future(timed(s, "  idx-bands") {
        writeOne(bandsDf.repartition(gbb, col("__bb")), gen,
          Seq("__bb"), bandsIdx(storeDir), replaceAll) }))), Duration.Inf)
  }

  /** Digests are the index's VALIDITY KEY (appended = corpus digests −
    * index digests), so they land LAST and alone, after sigs, bands,
    * and the publish have all settled: any partial outcome then reads
    * as digest drift on the next maintenance call (idempotent
    * re-append) or as the documented stale-fingerprint-empty-delta full
    * rebuild — fresh digests can never vouch for stale sigs/bands.
    */
  private def writeDigests(dg: DataFrame, gen: Long, storeDir: String,
                           replaceAll: Boolean,
                           deltaRows: Long = Long.MaxValue): Unit = {
    // a full rebuild COMPACTS: the fresh index has no dead rows, so the
    // accumulated tombstones (whose masked rows it replaces wholesale)
    // retire with it
    if (replaceAll) {
      val tp = new Path(tombstonesIdx(storeDir))
      val fs = fsOf(dg.sparkSession, tp)
      if (fs.exists(tp)) fs.delete(tp, true)
    }
    timed(dg.sparkSession, "  idx-digests") {
      writeOne(if (deltaRows <= SmallDeltaRows) dg.coalesce(1) else dg,
        gen, Seq.empty, digestsIdx(storeDir), replaceAll) }
  }

  /** Publish `labels` as generation `next`, named by (n, fp); returns
    * the generation number. One atomic rename exposes data + validity
    * together; all but the newest two generations retire after. The
    * caller must hold the generation fence ([[StoreDirs.acquireGen]])
    * for `next`; the CAS re-check here refuses to rename if the store
    * advanced since the caller's maintenance read — the publish-time
    * half of the concurrent-writer guard.
    */
  private def publishGen(s: SparkSession, storeDir: String, n: Long,
                         fp: Long, labels: DataFrame, next: Long): Long = {
    val root = new Path(storeDir)
    val fs = fsOf(s, root)
    fs.mkdirs(root)
    val gens = listGens(s, storeDir)
    StoreDirs.requireUnadvanced("LabelStore",
      gens.lastOption.map(_.k).getOrElse(0L), next)
    val staging = new Path(root, s".staging-$next")
    labels.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    // shared publish tail: atomic rename, sweeps, and grace-retire of
    // everything older than the previous latest (two live generations —
    // a reader that resolved just before this publish still scans
    // existing files)
    StoreDirs.publishStaged(fs, root, next, staging,
      new Path(root, s"gen=${next}__n=${n}__fp=${java.lang.Long.toHexString(fp)}"),
      gens.dropRight(1).map(_.path), "LabelStore")
    next
  }

  /** Canonical store location for the corpus at `dir` — stable across
    * processes so one build serves every later consumer (bench runs 2..N
    * take the fingerprint-match fast path); outside the repo tree so no
    * artifact lands in version control.
    */
  def defaultStoreDir(dir: String): String =
    StoreDirs.canonical("graft-label-store", dir)

  /** Unconditionally (re)build the store from the corpus at `dir`:
    * runs the full [[Dedup.x2DupClusters]] pipeline once and publishes
    * the labels as a new generation (plus the full signature/band
    * index backing future incremental appends).
    */
  def build(s: SparkSession, dir: String, storeDir: String): Unit =
    buildDocs(Tables.documents(s, dir), storeDir)

  /** Frame-based [[build]] — lets a caller scope the store to a corpus
    * SUBSET (the incremental unit tests' split build).
    */
  private[graft] def buildDocs(corpus0: DataFrame, storeDir: String,
                               owner: Option[String] = None): Unit = {
    val corpus = corpus0.persist()
    // the full-corpus signed frame feeds THREE consumers — the cluster
    // pipeline (via preSigned: its reps subset is a semi-join instead of
    // a re-shingle+re-minhash), the sigs index write, and the bands
    // index write. One signing pass, persisted, instead of three
    // (measured 2.9 s each at sf0.1)
    val sig = signed(corpus).persist()
    try {
      val s = corpus.sparkSession
      val dg = digests(corpus)
      val (n, fp) = fingerprintOf(dg)
      // materialize the shared signing pass ONCE, then run the cluster
      // pipeline + publish CONCURRENTLY with the sigs/bands index writes
      // — they share only the now-cached sig frame and touch disjoint
      // paths (gen dirs vs index/). The batch number is deterministic
      // (last gen + 1, asserted against publishGen's own computation);
      // digests still land last, after both, so crash consistency is
      // the writeDigests contract unchanged.
      timed(s, "sign") { sig.count() }
      val next = listGens(s, storeDir).lastOption.map(_.k).getOrElse(0L) + 1
      val storeRoot = new Path(storeDir)
      val storeFs = fsOf(s, storeRoot)
      // claim the generation BEFORE the first shared-path write (the
      // concurrent index future below): a competing maintainer at the
      // same parent fails loudly here instead of interleaving batch dirs
      StoreDirs.acquireGen(storeFs, storeRoot, next, owner)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val fIdx = Future(timed(s, "index-write") {
        writeSigsBands(sig, next, storeDir, replaceAll = true) })
      // settle the concurrent static overwrite before any failure exit —
      // INCLUDING an interrupt during the Await itself — and only then
      // release the fence: a zombie index write racing an in-process
      // retry is two writers statically overwriting the same directories
      try {
        val pub = timed(s, "cluster+publish") { publishGen(s, storeDir, n, fp,
          Dedup.x2DupClustersOf(corpus, preSigned = Some(sig)), next) }
        Await.result(fIdx, Duration.Inf)
        require(pub == next, s"LabelStore: build expected gen $next, published $pub")
        writeDigests(dg, next, storeDir, replaceAll = true)
      } catch { case t: Throwable =>
        settleQuietly(fIdx)
        StoreDirs.releaseGen(storeFs, storeRoot, next); throw t
      }
    } finally { sig.unpersist(); corpus.unpersist() }
  }

  /** Rebuild iff the corpus fingerprint no longer matches the newest
    * generation (or the store is empty). Returns true when a rebuild
    * ran — the unit contract for append detection.
    */
  def ensureCurrent(s: SparkSession, dir: String, storeDir: String): Boolean = {
    val (n, fp) = fingerprint(s, dir)
    listGens(s, storeDir).lastOption match {
      case Some(g) if g.n == n && g.fp == fp => false
      case _ => build(s, dir, storeDir); true
    }
  }

  /** [[ensureCurrent]] with an INCREMENTAL append path — the 100 TB
    * form: appends are the norm there, and a full rebuild per append
    * re-shingles, re-signs, re-bands and re-clusters the whole corpus
    * to relabel a sliver. Returns which path ran:
    * `"noop"` (fingerprint matches), `"incremental"` (append-only
    * delta merged), `"full"` (store empty / index missing / any stored
    * doc mutated or deleted — by measurement, the store's validity
    * discipline).
    *
    * The incremental merge signs ONLY the appended docs, probes the
    * stored band index bucket-pruned for old-side candidates, verifies
    * exact Jaccard against bucket-pruned stored shingles, then runs
    * connected components on the CONTRACTED graph: every old endpoint
    * maps to its current cluster label (old components are already
    * collapsed — their internal edges need no replay), so the fixpoint
    * input is O(new pairs), never O(all pairs). Old reps are minima of
    * their components, so the contracted min-label IS the global
    * min-label, and the merged output equals the full rebuild
    * (pinned in Round8Spec, and hash-oracled end-to-end by
    * `x2_labels_incremental`). Change detection pays one narrow
    * corpus scan (doc_id + text hash) — the price of validity by
    * measurement; a deployment with append manifests can skip it.
    */
  def ensureCurrentIncremental(s: SparkSession, dir: String,
                               storeDir: String): String =
    ensureIncrementalDocs(Tables.documents(s, dir), storeDir)

  /** Frame-based [[ensureCurrentIncremental]] — lets a caller scope the
    * corpus to a subset (the delete oracle row's reduced corpus).
    */
  private[graft] def ensureIncrementalDocs(corpus0: DataFrame,
                                           storeDir: String,
                                           owner: Option[String] = None): String = {
    val s = corpus0.sparkSession
    val corpus = corpus0.persist()
    val persisted = scala.collection.mutable.ArrayBuffer[DataFrame](corpus)
    def keep(df: DataFrame): DataFrame = { persisted += df; df.persist() }
    try {
      val dg = keep(digests(corpus))
      val (n, fp) = timed(s, "fingerprint") { fingerprintOf(dg) }
      val gens = listGens(s, storeDir)
      if (gens.lastOption.exists(g => g.n == n && g.fp == fp)) return "noop"
      val idxPath = new Path(digestsIdx(storeDir))
      if (gens.isEmpty || !fsOf(s, idxPath).exists(idxPath)) {
        buildDocs(corpus, storeDir, owner); return "full"
      }
      val latest = gens.last
      val (gbb, gdb) = geometry(s, storeDir)
      val ts = tombstones(s, storeDir, upTo = latest.k)
      val idx = maskDead(s.read.parquet(digestsIdx(storeDir)), ts)
        .select(col("doc_id"), col("h").as("h_idx"))
      // ONE full-outer digest pass classifies the whole delta (was two
      // anti-join scans): a row only in the corpus is an append; a row
      // only in the index is a delete; a changed hash is a mutation.
      // At 100 TB this is one pass over the digest sets instead of two.
      // localCheckpoint — NOT persist: the digests write below refreshes
      // its path, and a refresh RECACHES every plan that reads it; a
      // merely-cached delta would re-evaluate against the just-written
      // index and collapse to empty, silently emptying the sigs/bands
      // writes that follow. Truncating the lineage pins the delta to
      // what was measured before any write.
      val delta = timed(s, "classify") { dg.join(idx, Seq("doc_id"), "full")
        .filter(col("h").isNull || col("h_idx").isNull || col("h") =!= col("h_idx"))
        .select(col("doc_id"), col("h_idx").isNull.as("is_new"),
          col("h").isNull.as("is_del"))
        .localCheckpoint() }
      // one aggregate classifies the whole delta: appends, deletes, and
      // (by difference) mutations — was an isEmpty probe plus a
      // filter-count, two jobs
      val c = timed(s, "delta-agg") { delta.agg(count(lit(1)), count(when(col("is_new"), 1)),
        count(when(col("is_del"), 1))).head }
      val (nDelta, nNew, nDel) = (c.getLong(0), c.getLong(1), c.getLong(2))
      // mutations (nDelta > nNew + nDel), a mixed append+delete batch,
      // and the inconsistent empty-delta-with-stale-fingerprint state all
      // take the full rebuild — correct by construction, and each is rare
      // at 100 TB (appends and takedowns arrive as separate maintenance
      // calls; mutation means the corpus was edited in place)
      if (nDelta == 0 || nDelta != nNew + nDel || (nNew > 0 && nDel > 0)) {
        buildDocs(corpus, storeDir, owner); return "full"
      }

      if (nDel > 0) {
        // ---- incremental DELETE (tombstone) path: a takedown of k docs
        // must not re-sign the corpus. Drop the docs' index rows via a
        // tombstone batch (masked at read time, batch-aware), and
        // re-fixpoint ONLY the clusters the deleted docs touched: the
        // dup-pair graph is partitioned by its components, so removing
        // docs can only split/relabel THEIR components — every other
        // label row is untouched, and cost scales with the touched
        // membership, never the corpus.
        val deleted = delta.select(col("doc_id"))
        // compaction by measurement: once the dead fraction of the index
        // approaches the live corpus, probes pay more masking than a
        // rebuild costs — rebuild, which also clears the tombstones
        val priorDead = ts.map(_.count()).getOrElse(0L)
        if (priorDead + nDel > 0.5 * n) { buildDocs(corpus, storeDir, owner); return "full" }
        val oldLabels = keep(read(s, storeDir))
        val touchedReps = oldLabels.join(deleted, Seq("doc_id"), "left_semi")
          .select(col("cluster_rep")).distinct().localCheckpoint()
        val members = keep(oldLabels.join(touchedReps, Seq("cluster_rep"), "left_semi"))
        val touchedMass = members.count()
        // recompute cost ∝ touched members (re-sign + re-band + re-pair
        // just those); past half the corpus the full rebuild is cheaper
        // and compacts the index
        if (touchedMass > 0.5 * n) { buildDocs(corpus, storeDir, owner); return "full" }
        val labels =
          if (touchedMass == 0) oldLabels // deletes outside every cluster
          else {
            val survivors = keep(members.join(deleted, Seq("doc_id"), "left_anti")
              .select(col("doc_id")))
            // surviving members' shingles from the sigs index,
            // bucket-pruned (≤ SigBuckets driver-side values — bounded,
            // never data rows): the only per-doc state the re-cluster
            // needs; banding/signing reruns for the touched docs only
            val dbs = survivors
              .select(pmod(col("doc_id"), lit(gdb)).cast("int").as("__db"))
              .distinct().collect().map(_.getInt(0)).toSeq
            // __batch <= latest.k: a crashed append attempt's
            // unpublished sig slice must not masquerade as store state
            val sh = keep(maskDead(
                s.read.parquet(sigsIdx(storeDir))
                  .filter(col("__batch") <= latest.k && col("__db").isin(dbs: _*)), ts)
              .join(survivors, Seq("doc_id"), "left_semi")
              .select(col("doc_id"), col("sh")))
            val sig = sh.withColumn("sig", Dedup.minhashSig)
            val survBands = keep(bandsOf(sig))
            // EXACTNESS GATE (round-10 review): the from-scratch build on
            // the reduced corpus caps each (band,bh) bucket on the WHOLE
            // reduced population, while the re-pair below sees only the
            // touched survivors — a bucket over the cap in the reduced
            // corpus but not among the survivors would be starred by the
            // oracle and not here. Measure the reduced population of the
            // survivors' buckets (bucket-pruned, delete-masked) and fall
            // back to the full rebuild past the cap; sane geometries
            // never approach the 256-doc floor.
            val cap = Dedup.bucketCap(s, n)
            val survBb = survBands
              .select(pmod(col("bh"), lit(gbb)).cast("int").as("__bb"))
              .distinct().collect().map(_.getInt(0)).toSeq
            val reducedMax =
              if (survBb.isEmpty) 0L
              else maskDead(s.read.parquet(bandsIdx(storeDir))
                  .filter(col("__batch") <= latest.k && col("__bb").isin(survBb: _*)), ts)
                .join(deleted, Seq("doc_id"), "left_anti")
                .groupBy(col("band"), col("bh")).agg(count(lit(1)).as("__n"))
                .agg(coalesce(max(col("__n")), lit(0L))).head.getLong(0)
            if (reducedMax > cap) { buildDocs(corpus, storeDir, owner); return "full" }
            // Spread.pairs: the candidate frame's AQE-coalesced width
            // (bytes-derived, 1-2 tasks) serializes the CPU-dense exact
            // verify below (guide §2.2)
            val cand = graft.engine.Spread.pairs(
              Dedup.cappedSelfPairs(survBands, "doc_id",
                cap, "doc_a", "doc_b", keep), "doc_a")
            // exact Jaccard verification, identical arithmetic to the
            // full pipeline — the relabeled components must hash-match a
            // from-scratch build on the reduced corpus
            val edges = cand
              .join(sh.select(col("doc_id"), col("sh").as("sh_a")),
                col("doc_a") === col("doc_id")).drop("doc_id")
              .join(sh.select(col("doc_id"), col("sh").as("sh_b")),
                col("doc_b") === col("doc_id")).drop("doc_id")
              .filter(jaccardOk).select(col("doc_a"), col("doc_b"))
            val (relabeled, _) = Dedup.clusterPairs(edges)
            // untouched components keep their labels; touched ones are
            // replaced by the re-fixpoint (members leaving every cluster
            // drop out — they are singletons of the reduced corpus).
            // Edges never cross old components, so the per-component
            // recompute equals the global one.
            oldLabels.join(touchedReps, Seq("cluster_rep"), "left_anti")
              // the cluster_rep join key moves first — restore the
              // published (doc_id, cluster_rep) schema
              .select(col("doc_id"), col("cluster_rep"))
              .unionByName(relabeled)
          }
        // tombstones FIRST (numbered with the generation they publish
        // with — invisible until the rename), then the publish: a crash
        // in between leaves the store on the old generation with an
        // unpublished tombstone batch, and the retry re-detects the
        // deletes and overwrites that same batch
        val next = latest.k + 1
        val storeRoot = new Path(storeDir)
        val storeFs = fsOf(s, storeRoot)
        // first shared-path write of this lane is the tombstone batch —
        // claim the generation before it
        StoreDirs.withGenFence(storeFs, storeRoot, next, owner) {
          writeTombstones(deleted, next, storeDir)
          val pub = publishGen(s, storeDir, n, fp, labels.orderBy("doc_id"), next)
          require(pub == next, s"LabelStore: delete expected gen $next, published $pub")
        }
        return "incremental-delete"
      }

      val appended = delta.select(col("doc_id"))

      val cap = Dedup.bucketCap(s, n)
      val sig = keep(signed(corpus.join(appended, Seq("doc_id"), "left_semi")))
      val newBands = keep(bandsOf(sig))
      // materialize the delta signing ONCE (one small job), then this
      // batch's sigs/bands index writes run CONCURRENTLY with the whole
      // probe/verify/merge/publish chain below: the writes need only
      // the cached sig frame and the chain only the PREVIOUS batches.
      // The chain cannot see the in-flight batch — a parquet frame's
      // file index lists at construction, so the stored-index frames
      // are pinned BEFORE the writes launch — and its candidate frame
      // is localCheckpoint'd (not persisted), so the writes' path
      // refresh cannot trigger a mid-chain recache.
      timed(s, "delta-sign") { sig.count() }
      // gate the stored-index reads at the PUBLISHED batch range: a
      // crashed prior attempt can have left an unpublished __batch=next
      // slice in the index, and without the gate (a) the pinned listing
      // includes files the concurrent write below deletes and rewrites
      // — FileNotFoundException mid-chain on the retry that was supposed
      // to self-heal the crash — and (b) the crashed delta's rows would
      // be probed as "old" peers. Partition pruning keeps the stale
      // partition unread even though it is in the pinned listing.
      val (bandsStored, sigsStored) = timed(s, "pin-listings") {
        (s.read.parquet(bandsIdx(storeDir)).filter(col("__batch") <= latest.k),
          s.read.parquet(sigsIdx(storeDir)).filter(col("__batch") <= latest.k)) }
      val next = latest.k + 1
      val storeRoot = new Path(storeDir)
      val storeFs = fsOf(s, storeRoot)
      // claim the generation BEFORE the concurrent index future's first
      // batch write — the loser of a race fails loudly here, with the
      // store untouched by it
      StoreDirs.acquireGen(storeFs, storeRoot, next, owner)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val fIdx = Future(timed(s, "index-write") {
        writeSigsBands(sig, next, storeDir, replaceAll = false) })
      // the concurrent write must never outlive this call: on any
      // failure below, settle it before propagating — a zombie write
      // racing an in-process retry means two writers on one directory
      // the by-name block contains `return "full"` exits, which the
      // compiler lowers to ControlThrowable — that case MUST stay
      // settle-and-rethrow-untouched or the early return silently breaks.
      // ONLY VirtualMachineError passes unsettled (the process is dying;
      // no in-process retry can race the zombie write) — a blanket
      // NonFatal arm would leak the running write AND hold the fence
      // for a whole lease on e.g. InterruptedException from a stream
      // stop or job cancellation, where the process lives on.
      def failSettling[A](body: => A): A =
        try body catch {
          case t: VirtualMachineError => throw t
          case t: scala.util.control.ControlThrowable =>
            // the `return "full"` exit releases the fence itself before
            // rebuilding — this settle-only arm must not double-release
            // a fence the rebuild has since consumed
            settleQuietly(fIdx)
            throw t
          case t: Throwable =>
            // release ONLY after the settle completed: settleQuietly
            // retries through interrupts, so the fence never outlives a
            // running index write nor frees one still in flight
            settleQuietly(fIdx)
            StoreDirs.releaseGen(storeFs, storeRoot, next)
            throw t
        }
      failSettling {
      // new-new candidates through the shared hot-bucket guard;
      // Spread.pairs pins the exact-verify width (guide §2.2 — AQE's
      // byte-derived coalescing serializes the array_intersect work)
      val nn = graft.engine.Spread.pairs(
        Dedup.cappedSelfPairs(newBands, "doc_id", cap, "na", "nb", keep), "na")
      // new-old candidates: bucket-pruned probe of the stored bands
      // (≤ BandBuckets driver-side values — bounded, never data rows)
      // the bucket-list collect prunes the stored-bands scan — worth a
      // blocking job only when the delta can MISS buckets: a delta of
      // ≥ 4×BandBuckets band rows almost surely touches all 64, and the
      // collect would pay scheduler latency to learn nothing
      val touched = timed(s, "delta-bands") {
        if (nNew * Dedup.minhashBands >= 4L * gbb) (0 until gbb)
        else newBands
          .select(pmod(col("bh"), lit(gbb)).cast("int").as("__bb"))
          .distinct().collect().map(_.getInt(0)).toSeq }
      val no = timed(s, "probe-candidates") {
        if (touched.isEmpty) s.range(0).select(col("id").as("new_id"), col("id").as("old_id"))
        else {
          val probe = maskDead(
              bandsStored.filter(col("__bb").isin(touched: _*)), ts)
            .select(col("band"), col("bh"), col("doc_id").as("old_id"))
          // EXACTNESS GATE (round-10 review): the from-scratch pipeline
          // caps each (band,bh) bucket on its COMBINED population and
          // stars overflows; the append path sees the delta and the
          // store separately, so ANY local starring here (or none, when
          // each side is individually under-cap but the union is not)
          // can diverge from the oracle's from-scratch clusters. The
          // combined population is measurable for one blocking scalar —
          // over the cap, fall back to the full rebuild, whose own guard
          // then makes the identical starring decision the oracle sees.
          // Sane geometries never approach the 256-doc bucket floor;
          // a boilerplate pileup does, and rebuild-by-measurement is
          // the store's validity discipline everywhere else too.
          val storedCnt = probe.groupBy(col("band"), col("bh"))
            .agg(count(lit(1)).as("__ns"))
          val deltaCnt = newBands.groupBy(col("band"), col("bh"))
            .agg(count(lit(1)).as("__nd"))
          val maxCombined = storedCnt.join(deltaCnt, Seq("band", "bh"), "full")
            .select((coalesce(col("__ns"), lit(0L)) + coalesce(col("__nd"), lit(0L))).as("__n"))
            .agg(coalesce(max(col("__n")), lit(0L))).head.getLong(0)
          if (maxCombined > cap) {
            Await.result(fIdx, Duration.Inf)
            // release this lane's claim before the rebuild re-claims the
            // same generation number for itself
            StoreDirs.releaseGen(storeFs, storeRoot, next)
            buildDocs(corpus, storeDir, owner)
            return "full"
          }
          // localCheckpoint, NOT persist: the concurrent index writes
          // refresh the bands path on commit, and a refresh RECACHES
          // every persisted plan reading it — mid-chain that would
          // re-evaluate the candidates against a half-written batch
          probe
            .join(newBands.withColumnRenamed("doc_id", "new_id"), Seq("band", "bh"))
            .select(col("new_id"), col("old_id")).distinct().localCheckpoint()
        }
      }
      val nnV = nn
        .join(sig.select(col("doc_id"), col("sh").as("sh_a")), col("na") === col("doc_id")).drop("doc_id")
        .join(sig.select(col("doc_id"), col("sh").as("sh_b")), col("nb") === col("doc_id")).drop("doc_id")
        .filter(jaccardOk).select(col("na").as("doc_a"), col("nb").as("doc_b"))
      val peerBuckets = timed(s, "peer-buckets") { no
        .select(pmod(col("old_id"), lit(gdb)).cast("int").as("__db"))
        .distinct().collect().map(_.getInt(0)).toSeq } // ≤ SigBuckets values
      val noV =
        if (peerBuckets.isEmpty) nnV.limit(0)
        else {
          val oldSh = maskDead(
              sigsStored.filter(col("__db").isin(peerBuckets: _*)), ts)
            .select(col("doc_id"), col("sh").as("sh_b"))
          graft.engine.Spread.pairs(no, "new_id")
            .join(sig.select(col("doc_id"), col("sh").as("sh_a")), col("new_id") === col("doc_id")).drop("doc_id")
            .join(oldSh, col("old_id") === col("doc_id")).drop("doc_id")
            .filter(jaccardOk).select(col("new_id").as("doc_a"), col("old_id").as("doc_b"))
        }
      // CONTRACT: old endpoints collapse to their current label; an old
      // doc outside every cluster is its own contracted node. Old reps
      // are component minima, so min-label over the contracted graph is
      // the global min-label.
      val oldLabels = timed(s, "old-labels") { keep(read(s, storeDir)) }
      val contracted = noV
        .join(oldLabels.select(col("doc_id").as("doc_b"), col("cluster_rep")), Seq("doc_b"), "left")
        .select(col("doc_a"), coalesce(col("cluster_rep"), col("doc_b")).as("doc_b"))
      val (merged, _) = timed(s, "cluster-merge") {
        Dedup.clusterPairs(nnV.unionByName(contracted).distinct()) }
      // remap relabeled components; add rows for new docs and for old
      // singletons a new edge pulled into a cluster
      val remap = merged
        .select(col("doc_id").as("cluster_rep"), col("cluster_rep").as("__new_rep"))
      val labels = oldLabels.join(remap, Seq("cluster_rep"), "left")
        .select(col("doc_id"),
          coalesce(col("__new_rep"), col("cluster_rep")).as("cluster_rep"))
        .unionByName(merged.join(oldLabels.select(col("doc_id")), Seq("doc_id"), "left_anti"))
        .orderBy("doc_id")
      // publish (still concurrent with the sigs/bands writes launched
      // above), then settle both, then digests last — the writeDigests
      // crash contract
      val pub = timed(s, "labels-publish") {
        publishGen(s, storeDir, n, fp, labels, next) }
      Await.result(fIdx, Duration.Inf)
      require(pub == next, s"LabelStore: append expected gen $next, published $pub")
      writeDigests(dg.join(appended, Seq("doc_id"), "left_semi"), next,
        storeDir, replaceAll = false, deltaRows = nNew)
      "incremental"
      }
    } finally persisted.foreach(_.unpersist())
  }

  // The lanes below bench the production maintain+read path: the base
  // store is built once per (corpus, variant) per JVM and file-copied
  // per invocation — [[StoreDirs.cachedBaseStore]] (VERDICT r14 #5 /
  // r15 #1; the copy is a local-fs page-cached dir copy, ~0.2 s at
  // sf0.1). Correctness untouched: the maintain path runs in full every
  // invocation, the DuckDB oracle hash-checks every row, and the
  // session's first call is still a genuine from-scratch build.

  /** X2e'' [EXT] — label maintenance under append, end-to-end: start
    * from a store built on the corpus MINUS every 7th doc (base built
    * once per session, copied per invocation — see [[cachedBaseStore]]),
    * append those docs through [[ensureCurrentIncremental]], return the
    * final labels. Oracle: the full-corpus recursive-CTE clusters
    * ([[Dedup.x2DupClustersSql]]) — the incremental merge must equal
    * the from-scratch rebuild, hash-exactly.
    */
  def x2LabelsIncremental(s: SparkSession, dir: String): DataFrame = {
    val base = StoreDirs.cachedBaseStore(s"labelinc:$dir") { st =>
      buildDocs(Tables.documents(s, dir).filter(col("doc_id") % 7 =!= 0), st) }
    StoreDirs.withTempStore("graft-labelinc") { store =>
      StoreDirs.copyStore(s, base, store)
      val mode = ensureCurrentIncremental(s, dir, store)
      require(mode == "incremental", s"expected the incremental path, ran '$mode'")
      // pin the (cluster-sized) labels before the throwaway store deletes
      read(s, store).orderBy("doc_id").localCheckpoint()
    }
  }

  /** The delete oracle row removes every doc with
    * `doc_id % [[DeleteModulus]] == [[DeleteRemainder]]` — shared by the
    * Spark path and the SQL twin so the two cannot drift.
    */
  private val DeleteModulus = 5
  private val DeleteRemainder = 3

  /** X2e''' [EXT] — label maintenance under DELETE, end-to-end: build
    * the store on the FULL corpus, shrink the corpus to
    * `doc_id % 5 != 3`, run [[ensureCurrentIncremental]] (which must
    * take the tombstone path: index rows masked, only the touched
    * components re-fixpointed), return the final labels. Oracle: the
    * recursive-CTE clusters over the REDUCED corpus — the incremental
    * delete must equal a from-scratch rebuild on what remains,
    * hash-exactly.
    */
  def x2LabelsDelete(s: SparkSession, dir: String): DataFrame = {
    val base = StoreDirs.cachedBaseStore(s"labeldel:$dir") { st =>
      buildDocs(Tables.documents(s, dir), st) }
    StoreDirs.withTempStore("graft-labeldel") { store =>
      StoreDirs.copyStore(s, base, store)
      val reduced = Tables.documents(s, dir)
        .filter(col("doc_id") % DeleteModulus =!= DeleteRemainder)
      val mode = ensureIncrementalDocs(reduced, store)
      require(mode == "incremental-delete", s"expected the delete path, ran '$mode'")
      read(s, store).orderBy("doc_id").localCheckpoint()
    }
  }

  /** Oracle twin of [[x2LabelsDelete]], derived from
    * [[Dedup.x2DupClustersSql]]'s own text with the corpus reduced by the
    * same predicate (single-occurrence rewrite, checked loudly).
    */
  val x2LabelsDeleteSql: String = {
    val marker = "FROM documents)"
    require(Dedup.x2DupClustersSql.split(java.util.regex.Pattern.quote(marker), -1)
      .length == 2, "x2DupClustersSql no longer reads documents exactly once")
    Dedup.x2DupClustersSql.replace(marker,
      s"FROM (SELECT * FROM documents WHERE doc_id % $DeleteModulus <> $DeleteRemainder))")
  }

  /** Labels of the newest generation: (doc_id, cluster_rep), the exact
    * schema of [[Dedup.x2DupClusters]]. Resolves the generation at call
    * time.
    */
  def read(s: SparkSession, storeDir: String): DataFrame = {
    val gens = listGens(s, storeDir)
    require(gens.nonEmpty, s"LabelStore: no published generation under $storeDir")
    s.read.parquet(gens.last.path.toString)
  }

  /** [[Dedup.x2DedupKeep]] reading the STORE instead of recomputing the
    * cluster pipeline: the corpus is scanned once for the projection,
    * the dropped-id table comes from the label parquet (cluster-sized,
    * broadcastable), and nothing re-shingles or re-signs. Byte-identical
    * to the direct form whenever the store is current (pinned in
    * Round8Spec).
    */
  def keepSet(s: SparkSession, dir: String, storeDir: String): DataFrame = {
    val dropped = read(s, storeDir)
      .filter(col("doc_id") =!= col("cluster_rep"))
      .select(col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("lang"))
      .join(dropped, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }
}
