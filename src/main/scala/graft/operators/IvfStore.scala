package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** [EXT] Materialized IVF ANN INDEX — the [[LabelStore]] generational
  * discipline applied to [[Similarity.x3AnnIvf]]'s index half, with
  * INCREMENTAL append maintenance (VERDICT r8 item 6).
  *
  * Why it exists: `x3_ann_ivf` rebuilds the whole index inside every
  * query — seed sample, Lloyd refinement, argmax assignment of every
  * corpus vector. That is the right shape for an oracle-checked query
  * and the wrong one for production ANN serving, where the index is
  * built once per corpus version and probed by many queries. And at
  * 100 TB appends are the norm: re-clustering the whole corpus to
  * absorb a sliver of new vectors is the same anti-pattern the label
  * store retired for dup clusters. An append here signs ONLY the delta:
  * new vectors are argmax-assigned to the generation's FROZEN centroids
  * (the production IVF discipline — FAISS `add` vs `train`) and land as
  * a new list batch; a full re-train runs only when the measured cell
  * imbalance says the frozen quantizer no longer fits the data.
  *
  * Layout:
  *   - `storeDir/gen=<k>__n=<count>__fp=<digest>__b=<base>/centroids/` —
  *     (c_id, ce), [[Similarity.IvfNList]] rows, broadcast-sized; one
  *     directory per GENERATION, corpus fingerprint (row count +
  *     order-insensitive bit_xor digest) in the name so data and
  *     validity publish in one atomic rename. `b` is the generation's
  *     BASE batch: its inverted lists are batches `b..k`.
  *   - `storeDir/lists/__batch=<j>/c_id=<c>/` — the inverted lists
  *     (vec_id, e, norm), a SHARED dataset outside the generation dirs
  *     (the LabelStore index idiom): a full rebuild writes batch k and
  *     publishes base=k; an append writes only its own batch directory
  *     (idempotent under crash-retry — the batch number is the
  *     unpublished generation's, so a retry deletes and rewrites its
  *     own orphan) and publishes base=previous base. Probes filter
  *     `__batch ∈ [b, k]` AND the probed `c_id`s — both partition
  *     columns, so the scan reads only the probed cells of the live
  *     batches (partition pruning, asserted in Round8Spec).
  *   - `storeDir/digests/__batch=<j>/` — (vec_id, h) per batch, the
  *     append-detection key: appended = corpus digests − stored digests;
  *     any stored digest missing from the corpus means mutation/delete →
  *     full rebuild (validity by measurement, as everywhere).
  *
  * Retirement keeps the newest two generations' batch ranges live (the
  * BandStore reader contract: resolve-again recovers), retiring older
  * generation dirs by dot-rename and deleting list/digest batches no
  * live generation references.
  *
  * Determinism: the full build is bit-deterministic (md5 seed order,
  * exact decimal centroid means), assignment is per-vector pure, and
  * parquet round-trips doubles losslessly — so a store maintained by
  * appends equals a one-shot assignment of the full corpus to the same
  * centroids, and `x3_ann_ivf_inc` runs under a DuckDB twin that
  * regenerates exactly that ([[Similarity.x3AnnIvfIncSql]]).
  */
object IvfStore {

  /** Full re-train trigger: a cell holding more than this multiple of
    * the balanced share (n / nlist) means the frozen quantizer has
    * drifted from the data distribution — probe cost is proportional to
    * the largest probed cell, so a runaway cell is the measurable symptom
    * that centroids need re-learning. 8× tolerates the natural spread of
    * argmax assignment on uniform data (measured max/mean ≈ 2–3 on the
    * fixtures) while catching a skewed append well before one cell
    * degenerates toward a linear scan.
    */
  private val ImbalanceFactor = 8.0

  /** (vec_id, h) — the append-detection unit; same hash as
    * [[fingerprint]] aggregates, so the two validity checks cannot
    * diverge.
    */
  private def digestsOf(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), xxhash64(col("vec_id"), col("embedding")).as("h"))

  private def fingerprintOf(dg: DataFrame): (Long, Long) = {
    val r = dg.agg(count(lit(1)), expr("bit_xor(h)")).head
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** (row count, order-insensitive digest) over the embeddings table —
    * xxhash64 spans vec_id and the float array, so any vector edit
    * invalidates.
    */
  private[graft] def fingerprint(s: SparkSession, dir: String): (Long, Long) =
    fingerprintOf(digestsOf(Tables.embeddings(s, dir)))

  private case class Gen(k: Long, n: Long, fp: Long, base: Long, path: Path)

  private def fsOf(s: SparkSession, p: Path) =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  private val GenName = """gen=(\d+)__n=(\d+)__fp=([0-9a-f]+)__b=(\d+)""".r

  private def listGens(s: SparkSession, storeDir: String): Seq[Gen] = {
    val root = new Path(storeDir)
    val fs = fsOf(s, root)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.collect {
      case st if st.isDirectory => st.getPath.getName match {
        case GenName(k, n, fp, b) =>
          Some(Gen(k.toLong, n.toLong, java.lang.Long.parseUnsignedLong(fp, 16),
            b.toLong, st.getPath))
        case _ => None
      }
    }.flatten.sortBy(_.k)
  }

  private def listsDir(storeDir: String) = s"$storeDir/lists"
  private def digestsDir(storeDir: String) = s"$storeDir/digests"
  private def tombsDir(storeDir: String) = s"$storeDir/tombs"

  /** Tombstones visible to generation `gen` —
    * `tombs/__batch=<j>/ (vec_id, c_id)`, the FAISS `remove_ids`
    * analogue under the batch discipline: a delete lands its tombstone
    * batch numbered with the generation it publishes with, so the
    * published range filter `[base, k]` that gates every list/digest
    * read gates tombstones identically — a crashed (never-published)
    * delete attempt's batch sits outside the live range and the retry
    * overwrites it. `c_id` (from the narrow id scan at delete time) lets
    * later imbalance gauges subtract per-cell dead counts without ever
    * touching vector data.
    */
  private def tombstonesOf(s: SparkSession, storeDir: String,
                           gen: Gen): Option[DataFrame] = {
    val p = new Path(tombsDir(storeDir))
    if (!StoreDirs.hasBatchDirs(fsOf(s, p), p)) None
    else Some(readBatches(s, tombsDir(storeDir), gen.base, gen.k))
  }

  /** Drop rows a tombstone masks: a row is dead iff some visible
    * tombstone for its vec_id is STRICTLY newer than the row's batch —
    * batch-aware so a vector RE-ADDED after deletion (landing in a later
    * batch) stays live. Strict `>` rather than `>=`: the pure-delete
    * path lands no data rows in its tombstone's batch (the two are
    * equivalent there), and the log-driven RESTATE path
    * ([[appendVectors]]) lands the replacing row in the SAME batch as
    * the tombstone that kills its predecessor — one publish, and only
    * the strict comparison lets the replacement survive it. Tombstone
    * volume is bounded by the compaction trigger, so the anti-join's
    * build side stays small.
    */
  private def maskDead(df: DataFrame, ts: Option[DataFrame]): DataFrame =
    ts.fold(df) { t =>
      val k = t.select(col("vec_id").as("__ts_id"), col("__batch").as("__ts_b"))
      df.join(k, df("vec_id") === k("__ts_id") && k("__ts_b") > df("__batch"),
        "left_anti")
    }

  /** Write one batch of a shared partitioned dataset into its own
    * `__batch=<k>` directory — idempotent under crash-retry. Batch
    * `batch` is always UNPUBLISHED (no generation references it until
    * the publish rename), so the whole `__batch` directory is deleted
    * first: a crashed earlier attempt could have landed partitions
    * (e.g. `c_id`s) this retry no longer produces — those orphans would
    * go live with the publish and serve phantom rows (ADVICE r9,
    * medium).
    */
  private def writeBatch(df: DataFrame, batch: Long, parts: Seq[String],
                         dir: String): Unit = {
    val batchDir = new Path(dir, s"__batch=$batch")
    val fs = fsOf(df.sparkSession, batchDir)
    if (fs.exists(batchDir)) fs.delete(batchDir, true)
    // write DIRECTLY into the batch's own `__batch=<k>` directory (the
    // partition value comes from the dir name at read time, exactly as
    // the partitionBy form landed it) instead of a dynamic-partition
    // overwrite of the whole dataset: the batch is unpublished until the
    // generation rename so no reader can see the in-flight dir, the
    // delete above already makes retries idempotent, and the dynamic
    // committer's stage-and-move machinery was pure per-write overhead
    // (the LabelStore.writeOne discipline — measured there at ~2 s per
    // small write; here ~0.5 s per digests/tombs/lists write at sf0.1).
    val w = df.write.mode(SaveMode.Overwrite)
    (if (parts.isEmpty) w else w.partitionBy(parts: _*)).parquet(batchDir.toString)
  }

  private def readBatches(s: SparkSession, dir: String, from: Long, to: Long): DataFrame =
    s.read.parquet(dir).filter(col("__batch") >= from && col("__batch") <= to)

  /** Publish centroids as generation `next` with batch range
    * `[base, next]`, then retire: all but the newest two generation dirs
    * dot-rename away, and list/digest batches below the oldest live
    * generation's base are deleted (no live reader can reference them).
    */
  /** The last streaming micro-batch id this store has absorbed — the
    * exactly-once floor for [[appendVectors]]; carried forward through
    * every later publish (corpus-driven ones included) so a replayed
    * micro-batch stays a skip across mixed maintenance.
    */
  private def readIngestId(s: SparkSession, gen: Gen): Option[Long] = {
    val p = new Path(s"${gen.path}/ingest")
    val fs = fsOf(s, p)
    if (!fs.exists(p)) None
    // a scalar is driver metadata, not a dataset: the pre-r17 layout
    // stored it as a 1-row parquet, costing a full Spark job (listing +
    // footer + scan + collect, ~0.1-0.4 s) per exactly-once floor check
    // — several times per ingest lane. Plain text file now; the
    // directory form is the legacy layout, still readable.
    else if (fs.getFileStatus(p).isDirectory)
      Some(s.read.parquet(p.toString).collect().head.getLong(0))
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes,
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    }
  }

  private def publishGen(s: SparkSession, storeDir: String, next: Long, n: Long,
                         fp: Long, base: Long, centroids: DataFrame,
                         ingestId: Option[Long] = None): Unit = {
    val root = new Path(storeDir)
    val fs = fsOf(s, root)
    fs.mkdirs(root)
    val gens = listGens(s, storeDir)
    // CAS half of the concurrent-writer guard (the caller holds the
    // generation fence)
    StoreDirs.requireUnadvanced("IvfStore",
      gens.lastOption.map(_.k).getOrElse(0L), next)
    val staging = new Path(root, s".staging-$next")
    // Stale-dir discipline (same as writeBatch): a crashed prior attempt
    // at this generation may have left `$staging/ingest` behind; with
    // carried=None it would never be overwritten and a never-committed
    // micro-batch id would ride into the new generation, turning the
    // stream's retry of that batch into a silent skip.
    if (fs.exists(staging)) fs.delete(staging, true)
    centroids.write.mode(SaveMode.Overwrite).parquet(s"$staging/centroids")
    locally {
      val carried = (gens.lastOption.flatMap(readIngestId(s, _)) ++ ingestId)
        .reduceOption(_ max _)
      carried.foreach { id =>
        // scalar metadata as a plain file (see readIngestId): the 1-row
        // parquet form cost a Spark write job per publish
        val out = fs.create(new Path(s"$staging/ingest"), true)
        try out.write(id.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      }
    }
    StoreDirs.publishStaged(fs, root, next, staging,
      new Path(root,
        s"gen=${next}__n=${n}__fp=${java.lang.Long.toHexString(fp)}__b=${base}"),
      gens.dropRight(1).map(_.path), "IvfStore")
    val keepFrom = math.min(base, gens.lastOption.map(_.base).getOrElse(base))
    Seq(listsDir(storeDir), digestsDir(storeDir), tombsDir(storeDir)).foreach { d =>
      val dp = new Path(d)
      if (fs.exists(dp)) fs.listStatus(dp).foreach { st =>
        st.getPath.getName match {
          case s"__batch=$b" if b.toLongOption.exists(_ < keepFrom) =>
            fs.delete(st.getPath, true)
          case _ => ()
        }
      }
    }
  }

  /** Unconditionally (re)build the index from the corpus at `dir` and
    * publish it as a new generation (base = its own batch: the previous
    * generations' lists stop being referenced and retire).
    */
  def build(s: SparkSession, dir: String, storeDir: String): Unit =
    buildVecs(Tables.embeddings(s, dir), storeDir)

  /** Frame-based [[build]] — lets a caller scope the store to a corpus
    * SUBSET (the incremental oracle row's split build).
    */
  private[graft] def buildVecs(emb: DataFrame, storeDir: String,
                               ingestId: Option[Long] = None,
                               owner: Option[String] = None): Unit = {
    val s = emb.sparkSession
    val dg = digestsOf(emb)
    val (n, fp) = fingerprintOf(dg)
    // NOT persisted (VERDICT r14 #1, the 8 GiB heap bound): the corpus
    // is scanned exactly twice — the bounded training-sample TakeOrdered
    // inside ivfIndex and the single list-assignment pass — and pinning
    // millions of normalized vectors in the block manager was the
    // rebuild path's memory wall; two streaming scans are the
    // scale-correct trade (at 100 TB the corpus could never persist).
    val e = Similarity.normedOf(emb)
    val (cent, lists, smp) = Similarity.ivfIndexWithSample(e)
    try {
      val next = listGens(s, storeDir).lastOption.map(_.k).getOrElse(0L) + 1
      val root = new Path(storeDir)
      val fs = fsOf(s, root)
      StoreDirs.withGenFence(fs, root, next, owner) {
        writeBatch(lists.repartition(Similarity.IvfNList, col("c_id")), next, Seq("c_id"), listsDir(storeDir))
        writeBatch(dg, next, Seq.empty, digestsDir(storeDir))
        publishGen(s, storeDir, next, n, fp, base = next, centroids = cent,
          ingestId = ingestId)
      }
    } finally { cent.unpersist(); smp.unpersist() }
  }

  /** Rebuild iff the corpus fingerprint no longer matches the newest
    * generation (or the store is empty); true when a rebuild ran.
    */
  def ensureCurrent(s: SparkSession, dir: String, storeDir: String): Boolean = {
    val (n, fp) = fingerprint(s, dir)
    listGens(s, storeDir).lastOption match {
      case Some(g) if g.n == n && g.fp == fp => false
      case _ => build(s, dir, storeDir); true
    }
  }

  /** [[ensureCurrent]] with the INCREMENTAL append path. Returns which
    * path ran: `"noop"` (fingerprint matches), `"incremental"`
    * (append-only delta assigned to the frozen generation centroids and
    * landed as a new list batch), `"full"` (store empty / any stored
    * vector mutated or deleted / measured cell imbalance past
    * [[ImbalanceFactor]] — the re-train triggers, all by measurement).
    *
    * Append cost is O(delta · nlist) for the assignment plus a
    * metadata-cheap per-cell count for the imbalance gauge — never a
    * corpus re-scan; the full rebuild costs O(sample) centroid training
    * plus ONE O(corpus · nlist) assignment pass — r15 retired the
    * full-corpus assign-refine-reassign cycle (two corpus passes) that
    * went superlinear at 5M vectors. The maintained index equals a
    * one-shot assignment of the whole corpus to the same centroids
    * because assignment is per-vector pure ([[Similarity.ivfAssign]]).
    */
  def ensureCurrentIncremental(s: SparkSession, dir: String,
                               storeDir: String): String =
    ensureIncrementalVecs(Tables.embeddings(s, dir), storeDir)

  private[graft] def ensureIncrementalVecs(emb: DataFrame, storeDir: String): String = {
    val s = emb.sparkSession
    val dg = digestsOf(emb).persist()
    try {
      val (n, fp) = fingerprintOf(dg)
      val gens = listGens(s, storeDir)
      if (gens.lastOption.exists(g => g.n == n && g.fp == fp)) return "noop"
      val gen = gens.lastOption.getOrElse { buildVecs(emb, storeDir); return "full" }
      val dgPath = new Path(digestsDir(storeDir))
      if (!fsOf(s, dgPath).exists(dgPath)) { buildVecs(emb, storeDir); return "full" }
      val ts = tombstonesOf(s, storeDir, gen)
      val stored = maskDead(readBatches(s, digestsDir(storeDir), gen.base, gen.k), ts)
        .select(col("vec_id"), col("h").as("h_idx"))
      // ONE full-outer digest pass classifies the delta (the LabelStore
      // discipline): corpus-only rows are appends; index-only rows are
      // deletes; hash-changed rows are mutations → full rebuild.
      // localCheckpoint, not persist: the batch writes below refresh the
      // store paths, and a refresh RECACHES plans reading them — the
      // delta must stay pinned to its pre-write measurement
      val delta = dg.join(stored, Seq("vec_id"), "full")
        .filter(col("h").isNull || col("h_idx").isNull || col("h") =!= col("h_idx"))
        .select(col("vec_id"), col("h_idx").isNull.as("is_new"),
          col("h").isNull.as("is_del"))
        .localCheckpoint()
      // one aggregate classifies the whole delta: appends, deletes, and
      // (by difference) mutations
      val c = delta.agg(count(lit(1)), count(when(col("is_new"), 1)),
        count(when(col("is_del"), 1))).head
      val (nDelta, nNew, nDel) = (c.getLong(0), c.getLong(1), c.getLong(2))
      if (nDelta == 0 || nDelta != nNew + nDel || (nNew > 0 && nDel > 0)) {
        buildVecs(emb, storeDir); return "full"
      }
      val cent = s.read.parquet(s"${gen.path}/centroids")
      val next = gen.k + 1

      if (nDel > 0) {
        // ---- incremental DELETE (tombstone) path — FAISS `remove_ids`
        // under the batch discipline: a takedown must not re-train or
        // re-assign anything. One NARROW id scan of the lists (vec_id +
        // the c_id partition column — no vector data crosses the wire)
        // locates the dead rows' cells; the tombstone batch masks them at
        // probe time; centroids stay frozen. Cost: the id scan plus a
        // tombstone write sized by the delete, never a corpus re-scan.
        val deleted = delta.select(col("vec_id"))
        // compaction by measurement: once the dead fraction approaches
        // the live corpus, probes pay more masking than a rebuild costs
        val priorDead = ts.map(_.count()).getOrElse(0L)
        if (priorDead + nDel > 0.5 * n) { buildVecs(emb, storeDir); return "full" }
        val live = maskDead(readBatches(s, listsDir(storeDir), gen.base, gen.k)
          .select(col("vec_id"), col("c_id"), col("__batch")), ts)
        val newTombs = live.join(deleted, Seq("vec_id"), "left_semi")
          .select(col("vec_id"), col("c_id")).localCheckpoint()
        // imbalance gauge against the REDUCED balanced share: deletes
        // concentrated away from a hot cell can leave its share past the
        // bound — the same measured symptom that the frozen quantizer no
        // longer fits what remains
        val maxCell = live.join(deleted, Seq("vec_id"), "left_anti")
          .groupBy(col("c_id")).agg(count(lit(1)).as("cnt"))
          .agg(coalesce(max(col("cnt")), lit(0L))).head.getLong(0)
        if (maxCell > ImbalanceFactor * n / Similarity.IvfNList) {
          buildVecs(emb, storeDir); return "full"
        }
        // tombstones land as batch `next` BEFORE the publish: outside the
        // published range until the rename, so a crash in between leaves
        // the old generation serving unmasked and the retry (which still
        // sees the deletes in the stored digests) overwrites the batch
        locally {
          val root = new Path(storeDir)
          val fs = fsOf(s, root)
          StoreDirs.withGenFence(fs, root, next) {
            writeBatch(newTombs.coalesce(8), next, Seq.empty, tombsDir(storeDir))
            publishGen(s, storeDir, next, n, fp, base = gen.base, centroids = cent)
          }
        }
        return "incremental-delete"
      }

      val appended = delta.select(col("vec_id"))
      val assigned = Similarity.ivfAssign(
        Similarity.normedOf(emb.join(appended, Seq("vec_id"), "left_semi")),
        cent).localCheckpoint()
      // imbalance gauge: merged per-cell counts vs the balanced share.
      // The stored side is a count over the lists' partition columns —
      // columnar metadata, no vector data crosses the wire — minus the
      // per-cell dead counts the tombstones carry.
      val oldCells = readBatches(s, listsDir(storeDir), gen.base, gen.k)
        .groupBy(col("c_id")).agg(count(lit(1)).as("cnt"))
      val deadCells = ts.map(_.groupBy(col("c_id")).agg((-count(lit(1))).as("cnt")))
      val newCells = assigned.groupBy(col("c_id")).agg(count(lit(1)).as("cnt"))
      // coalesce: a null max (empty merged counts — unreachable today
      // because the delta is checked non-empty first, but the guard must
      // not be implicit in caller order) reads as 0, not an NPE
      val maxCell = deadCells.foldLeft(oldCells.unionByName(newCells))(_ unionByName _)
        .groupBy(col("c_id")).agg(sum(col("cnt")).as("cnt"))
        .agg(coalesce(max(col("cnt")), lit(0L))).head.getLong(0)
      if (maxCell > ImbalanceFactor * n / Similarity.IvfNList) {
        buildVecs(emb, storeDir); return "full"
      }
      locally {
        val root = new Path(storeDir)
        val fs = fsOf(s, root)
        StoreDirs.withGenFence(fs, root, next) {
          writeBatch(assigned.repartition(Similarity.IvfNList, col("c_id")), next, Seq("c_id"), listsDir(storeDir))
          writeBatch(dg.join(appended, Seq("vec_id"), "left_semi"), next,
            Seq.empty, digestsDir(storeDir))
          publishGen(s, storeDir, next, n, fp, base = gen.base, centroids = cent)
        }
      }
      "incremental"
    } finally dg.unpersist()
  }

  private def latest(s: SparkSession, storeDir: String): Gen = {
    val gens = listGens(s, storeDir)
    require(gens.nonEmpty, s"IvfStore: no published generation under $storeDir")
    gens.last
  }

  /** The query half of [[Similarity.x3AnnIvf]] served from the store:
    * centroids load broadcast-sized, the probed cell ids collect
    * driver-side (≤ [[Similarity.IvfNList]] values — bounded by the
    * cell count, never the data), and the lists scan carries partition
    * filters on exactly the live batch range and those cells. No
    * corpus-wide stage remains in the query path.
    */
  def probe(s: SparkSession, dir: String, storeDir: String): DataFrame = {
    val (qCells, lists) = probeInputs(s, dir, storeDir)
    Similarity.ivfScore(lists, qCells)
  }

  /** The probe's two inputs, exposed so the partition-pruning claim is
    * asserted on the EXACT lists frame the probe joins (Round8Spec).
    * `maxQueryId` narrows the query set (the oracle surface uses the
    * standard vec_id < 10).
    */
  private[graft] def probeInputs(s: SparkSession, dir: String, storeDir: String,
                                 maxQueryId: Long = 10L): (DataFrame, DataFrame) = {
    val gen = latest(s, storeDir)
    val cent = s.read.parquet(s"${gen.path}/centroids")
    val queries = Similarity.normed(s, dir).filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("norm").as("qnorm"))
    val qCells = Similarity.ivfQueryCells(cent, queries)
    val probed = qCells.select(col("c_id")).distinct()
      .collect().map(_.getInt(0)).toSeq
    // cell + batch-range partition filters first, THEN the tombstone
    // mask: the anti-join's probe side is already pruned to the probed
    // cells and its build side is delete-sized
    val lists = maskDead(
        readBatches(s, listsDir(storeDir), gen.base, gen.k)
          .filter(col("c_id").isin(probed: _*)),
        tombstonesOf(s, storeDir, gen))
      .select(col("vec_id"), col("e"), col("norm"), col("c_id"))
    (qCells, lists)
  }

  /** Every live vector the store serves — the tombstone-masked union of
    * the live batch range, `(vec_id, e, norm, c_id)`. The stress-scale
    * recall measurement's exact side reads THIS (the corpus exactly as
    * the store serves it, deletes and ingests applied), so recall@k is
    * measured against what a probe could possibly return — not against
    * a corpus file the store has since diverged from.
    */
  private[graft] def liveVectors(s: SparkSession, storeDir: String): DataFrame = {
    val gen = latest(s, storeDir)
    maskDead(readBatches(s, listsDir(storeDir), gen.base, gen.k),
      tombstonesOf(s, storeDir, gen))
      .select(col("vec_id"), col("e"), col("norm"), col("c_id"))
  }

  /** Canonical store location for the corpus at `dir` — stable across
    * processes so one build serves every later probe (the LabelStore
    * idiom); outside the repo tree. Keyed by the sanitized path PLUS an
    * md5 of the raw path (ADVICE r9: sanitization alone collides
    * `/a/b` with `/a_b`, and a fully predictable key under the shared
    * tmpdir invites pre-seeding); the root is created owner-only.
    */
  def defaultStoreDir(dir: String): String =
    StoreDirs.canonical("graft-ivf-store", dir)

  /** X3c''' [EXT] — the PRODUCTION serve path: [[ensureCurrent]] against
    * the canonical store (fingerprint match → no build at all), then the
    * partition-pruned probe. Same oracle as `x3_ann_ivf`: the stored
    * index is bit-identical to the in-query build, so this row puts the
    * cold-start-amortized read path itself under the hash gate — and the
    * bench shows the served cost (probe only after the first run)
    * instead of only build-inside-query numbers.
    */
  def x3AnnIvfServed(s: SparkSession, dir: String): DataFrame = {
    val store = defaultStoreDir(dir)
    ensureCurrent(s, dir, store)
    probe(s, dir, store)
  }

  /** X3c' [EXT] — the store round trip under the hash gate: build the
    * index, serve the probe from it. Same oracle as `x3_ann_ivf` (the
    * build is bit-deterministic and parquet round-trips doubles
    * losslessly), so a store/serve divergence fails the hash compare.
    */
  def x3AnnIvfStore(s: SparkSession, dir: String): DataFrame =
    StoreDirs.withTempStore("graft-ivfstore") { store =>
      build(s, dir, store)
      // localCheckpoint pins the (top-k-sized) result before the
      // throwaway store is deleted — the probe plan reads store files
      probe(s, dir, store).localCheckpoint()
    }

  /** X3c'' [EXT] — index maintenance under append, end-to-end: build the
    * store on the corpus MINUS every 7th vector, append those through
    * [[ensureCurrentIncremental]] (frozen centroids, delta-only
    * assignment), probe the maintained index. Oracle:
    * [[Similarity.x3AnnIvfIncSql]] — the full-corpus pipeline with
    * centroids derived from the same base subset, so the maintained
    * index is hash-checked against a from-scratch construction.
    */
  def x3AnnIvfIncremental(s: SparkSession, dir: String): DataFrame = {
    // base-store methodology (VERDICT r14 #5 / r15 #1, as the label
    // lanes): the split build is the lane's BASE state — production
    // builds once and appends forever — so it is built once per JVM and
    // file-copied per invocation; the maintain+probe path runs in full
    // every time and the oracle hash-checks every invocation's output
    val base = StoreDirs.cachedBaseStore(s"ivfinc:$dir") { st =>
      buildVecs(Tables.embeddings(s, dir).filter(col("vec_id") % 7 =!= 0), st)
    }
    StoreDirs.withTempStore("graft-ivfinc") { store =>
      StoreDirs.copyStore(s, base, store)
      val mode = ensureCurrentIncremental(s, dir, store)
      require(mode == "incremental", s"expected the incremental path, ran '$mode'")
      probe(s, dir, store).localCheckpoint()
    }
  }

  /** The delete oracle row removes every vector with
    * `vec_id % 5 == 3 && vec_id >= 10` — the floor spares the 10 probe
    * queries (they read from the corpus table, which the twin reduces
    * identically). Shared with [[Similarity.x3AnnIvfDelSql]].
    */
  private[graft] val DeletePredicateSql = "vec_id % 5 = 3 AND vec_id >= 10"

  /** X3c'''' [EXT] — index maintenance under DELETE, end-to-end: build
    * the store on the FULL corpus (centroids trained on everything),
    * shrink the corpus by the predicate above, run
    * [[ensureCurrentIncremental]] — which must take the tombstone path:
    * frozen centroids, one narrow id scan, dead rows masked at probe
    * time — then probe. Oracle: [[Similarity.x3AnnIvfDelSql]], the
    * full-corpus centroid pipeline with the inverted lists reduced by
    * the same predicate, so the tombstone-masked index is hash-checked
    * against a from-scratch construction on what remains (deleted
    * vectors must vanish from every top-k).
    */
  def x3AnnIvfDelete(s: SparkSession, dir: String): DataFrame = {
    // base-store methodology — see [[x3AnnIvfIncremental]]
    val base = StoreDirs.cachedBaseStore(s"ivfdel:$dir") { st =>
      buildVecs(Tables.embeddings(s, dir), st)
    }
    StoreDirs.withTempStore("graft-ivfdel") { store =>
      StoreDirs.copyStore(s, base, store)
      val reduced = Tables.embeddings(s, dir)
        .filter(!(col("vec_id") % 5 === 3 && col("vec_id") >= 10))
      val mode = ensureIncrementalVecs(reduced, store)
      require(mode == "incremental-delete", s"expected the delete path, ran '$mode'")
      probe(s, dir, store).localCheckpoint()
    }
  }

  /** LOG-DRIVEN vector ingestion — the [[graft.sources.DateStore]]
    * `appendEvents` discipline for the ANN index (the reference's
    * consumer loop appends each polled batch to its store, ref:
    * consumer.py:23-25): embeddings arrive as micro-batch DELTAS, so
    * this path upserts without ever holding the corpus. Per batch:
    * exact re-deliveries (same vec_id, same digest) drop idempotently;
    * new vectors argmax-assign to the FROZEN generation centroids;
    * restated vectors (same vec_id, new digest — a re-embedded
    * document) tombstone their predecessor and land the replacement in
    * the SAME publish (the strict-`>` mask lets the replacement outrank
    * the tombstone it ships with). Cold start trains centroids on the
    * first batch (the FAISS train-on-sample discipline). When the
    * measured cell imbalance says the frozen quantizer no longer fits,
    * the index re-trains FROM THE STORE — the lists already hold the
    * normalized vectors, so no raw corpus is needed, which is what
    * makes the path genuinely log-driven.
    *
    * Exactly-once floor on quiet batches: `"empty"`/`"noop"` returns do
    * NOT advance the published floor (a floor bump would mean either a
    * full generation publish per quiet batch or mutating the live
    * generation's `ingest` file in place — breaking the
    * immutable-once-published model the atomic rename provides).
    * Correctness holds — a replay of a quiet batch re-derives the same
    * empty/noop — but such a replay pays the digest classification scan
    * instead of the `skip` fast path. That scan is the narrow
    * (vec_id, h) columnar read described below, and replays only occur
    * on crash-recovery of an already-quiet batch, so the cost is rare
    * and bounded, not per-batch.
    *
    * Validity stays cross-checkable with the corpus-driven paths: the
    * published fingerprint is updated by XOR arithmetic (arrivals in,
    * restated predecessors out), so a later [[ensureCurrentIncremental]]
    * against the materialized corpus is a provable noop — pinned by the
    * `x3_ann_ivf_ingest` oracle row. Exactly-once as in the date store:
    * the publish carries the micro-batch id, and a batch at or below
    * the floor skips.
    *
    * Scale honesty: classification reads the stored DIGESTS (vec_id, h
    * — 16 bytes/row, ~0.02% of vector data volume) once per
    * micro-batch. At production scale that join's shuffle self-prunes:
    * the batch side is far below the runtime bloom-filter creation
    * threshold and the digest scan far above the application threshold,
    * so `InjectRuntimeFilter` (pinned in Round10Spec) drops non-batch
    * ids before the exchange — the residual cost is the narrow columnar
    * scan, amortized by batch frequency. STRESS_r10 `vec_ingest`
    * measures the whole path flat at 1M vectors.
    */
  def appendVectors(batch: DataFrame, storeDir: String,
                    streamBatchId: Long,
                    ownerScope: Option[String] = None): String = {
    val s = batch.sparkSession
    val gens = listGens(s, storeDir)
    gens.lastOption.flatMap(readIngestId(s, _)) match {
      case Some(last) if last >= streamBatchId => return "skip"
      case _ => ()
    }
    val cleaned = batch.select(col("vec_id"), col("embedding")).distinct()
      .localCheckpoint()
    // every pinned frame is freed on exit — a long-lived ingest stream
    // runs thousands of micro-batches (the clusterPairs lesson)
    val pinned = scala.collection.mutable.ArrayBuffer[DataFrame](cleaned)
    try {
      // conflicting versions of one id inside a single micro-batch have
      // no defined order here — that is the producer's sequencing (the
      // L5 upsert sink's max-offset discipline); fail loudly, not last-
      // writer-by-luck. ONE aggregate answers emptiness and the
      // conflict check together (r17: this ran as three separate jobs —
      // isEmpty + distinct-count + count — per micro-batch)
      val shape = cleaned.agg(count(lit(1)), countDistinct(col("vec_id"))).head
      if (shape.getLong(0) == 0) return "empty"
      require(shape.getLong(0) == shape.getLong(1),
        s"IvfStore.appendVectors: a micro-batch carries conflicting embeddings for the same vec_id")
      val dgPath = new Path(digestsDir(storeDir))
      val gen0 = gens.lastOption.filter(_ => fsOf(s, dgPath).exists(dgPath))
      if (gen0.isEmpty) {
        // same owner token as the append lane below: an in-process
        // replay of batch 0 reclaims its own debris via the exact
        // process token (zero lease); a RESTARTED driver gets the short
        // restart lease only when ownerScope carries the checkpoint —
        // the bare ingest-<batchId> form waits the full foreign lease
        // (ADVICE r12: a bare batch counter proves no stream identity)
        buildVecs(cleaned, storeDir, ingestId = Some(streamBatchId),
          owner = Some(ownerScope.fold(s"ingest-$streamBatchId")(cp =>
            s"ingest-$cp-$streamBatchId")))
        return "ingest-initial"
      }
      val gen = gen0.get
      val next = gen.k + 1
      val ts = tombstonesOf(s, storeDir, gen)
      val stored = maskDead(readBatches(s, digestsDir(storeDir), gen.base, gen.k), ts)
        .select(col("vec_id"), col("h").as("h_idx"))
      val classified = digestsOf(cleaned)
        .join(stored, Seq("vec_id"), "left")
        .select(col("vec_id"), col("h"), col("h_idx"),
          col("h_idx").isNull.as("is_new"),
          (col("h_idx").isNotNull && col("h") =!= col("h_idx")).as("is_restate"))
        .filter(col("is_new") || col("is_restate"))
        .localCheckpoint()
      pinned += classified
      val c = classified.agg(count(lit(1)),
        count(when(col("is_new"), 1)),
        expr("bit_xor(h)"), expr("bit_xor(h_idx)")).head
      val (nUp, nNew) = (c.getLong(0), c.getLong(1))
      if (nUp == 0) return "noop" // pure re-delivery — idempotent drop
      val xIn = if (c.isNullAt(2)) 0L else c.getLong(2)
      val xOut = if (c.isNullAt(3)) 0L else c.getLong(3)
      val nRe = nUp - nNew
      // arrivals XOR in, restated predecessors XOR out — the published
      // fingerprint stays bit-identical to a from-scratch digest of the
      // corpus this store now serves
      val nAfter = gen.n + nNew
      val fpAfter = gen.fp ^ xIn ^ xOut
      // both lanes below (retrain-from-store and frozen-centroid append)
      // write batch `next` — claim it once, before either's first write.
      // The owner token lets an IN-PROCESS crash-replay of this
      // micro-batch reclaim its own fence debris immediately (exact
      // process token, zero lease); a restarted driver process earns the
      // short restart lease only when ownerScope carries the checkpoint
      // — the bare ingest-<batchId> form waits the full foreign lease
      // (ADVICE r12).
      val fenceRoot = new Path(storeDir)
      val fenceFs = fsOf(s, fenceRoot)
      StoreDirs.withGenFence(fenceFs, fenceRoot, next,
        owner = Some(ownerScope.fold(s"ingest-$streamBatchId")(cp =>
          s"ingest-$cp-$streamBatchId"))) {
      val upIds = classified.select(col("vec_id"))
      val reIds = classified.filter(col("is_restate")).select(col("vec_id"))
      val newVecs = cleaned.join(upIds, Seq("vec_id"), "left_semi")
      val cent = s.read.parquet(s"${gen.path}/centroids")
      val assigned = Similarity.ivfAssign(Similarity.normedOf(newVecs), cent)
        .localCheckpoint()
      pinned += assigned
      // imbalance gauge over what the store will serve AFTER this batch:
      // surviving old rows (narrow id columns) plus the new assignments.
      // A restating batch reads this scan twice (gauge + the
      // predecessors' tombstones below) — pin it once; a pure append
      // reads it once and pins nothing
      val liveBase0 = maskDead(readBatches(s, listsDir(storeDir), gen.base, gen.k)
          .select(col("vec_id"), col("c_id"), col("__batch")), ts)
        .select(col("vec_id"), col("c_id"))
      val liveBase =
        if (nRe == 0) liveBase0
        else { val p = liveBase0.localCheckpoint(); pinned += p; p }
      val liveIds = liveBase.join(reIds, Seq("vec_id"), "left_anti")
      val maxCell = liveIds.groupBy(col("c_id")).agg(count(lit(1)).as("cnt"))
        .unionByName(assigned.groupBy(col("c_id")).agg(count(lit(1)).as("cnt")))
        .groupBy(col("c_id")).agg(sum(col("cnt")).as("cnt"))
        .agg(coalesce(max(col("cnt")), lit(0L))).head.getLong(0)
      if (maxCell > ImbalanceFactor * nAfter / Similarity.IvfNList) {
        // re-train FROM THE STORE: surviving normalized vectors ∪ the
        // batch's — fresh centroids, fresh single-batch lists/digests
        // (base = next also compacts away every tombstone)
        val liveNorm = maskDead(readBatches(s, listsDir(storeDir), gen.base, gen.k)
            .select(col("vec_id"), col("e"), col("norm"), col("__batch")), ts)
          .join(reIds, Seq("vec_id"), "left_anti")
          .select(col("vec_id"), col("e"), col("norm"))
        // localCheckpoint, not persist (the BandStore write-tax lesson,
        // ROUND12.md §3): liveNorm's plan reads listsDir, and the lists
        // write below ends in refreshByPath(listsDir) — a registered
        // cache over the written tree makes every write walk and recache
        // it; a pinned LogicalRDD has no file relation to match
        val allNorm = liveNorm.unionByName(Similarity.normedOf(newVecs))
          .localCheckpoint()
        pinned += allNorm
        val (cent2, lists2, smp2) = Similarity.ivfIndexWithSample(allNorm)
        try {
          val liveDg = maskDead(
              readBatches(s, digestsDir(storeDir), gen.base, gen.k), ts)
            .join(reIds, Seq("vec_id"), "left_anti")
            .select(col("vec_id"), col("h"))
          writeBatch(lists2.repartition(Similarity.IvfNList, col("c_id")), next, Seq("c_id"),
            listsDir(storeDir))
          writeBatch(liveDg.unionByName(digestsOf(newVecs)), next, Seq.empty,
            digestsDir(storeDir))
          publishGen(s, storeDir, next, nAfter, fpAfter, base = next,
            centroids = cent2, ingestId = Some(streamBatchId))
        } finally { cent2.unpersist(); smp2.unpersist() } // allNorm pinned → freed via `pinned`
        return "ingest-retrain"
      }
      if (nRe > 0) {
        // the restated predecessors' tombstones ship in the same publish
        // as their replacements (strict-`>` mask semantics above); reads
        // the pinned liveBase blocks, not the lists again
        val newTombs = liveBase.join(reIds, Seq("vec_id"), "left_semi")
        writeBatch(newTombs.coalesce(8), next, Seq.empty, tombsDir(storeDir))
      }
      writeBatch(assigned.repartition(Similarity.IvfNList, col("c_id")), next, Seq("c_id"),
        listsDir(storeDir))
      writeBatch(digestsOf(newVecs), next, Seq.empty, digestsDir(storeDir))
      publishGen(s, storeDir, next, nAfter, fpAfter, base = gen.base,
        centroids = cent, ingestId = Some(streamBatchId))
      "ingest"
      // the `return "ingest-retrain"` above exits through the fence
      // scope as a ControlThrowable — withGenFence passes it through
      // with the (published) generation's fence kept, by design
      }
    } finally pinned.foreach(StoreDirs.freePinned)
  }

  /** The streaming entry — AvailableNow micro-batches of embeddings
    * upsert through [[appendVectors]] under a checkpoint; replays are
    * skips, so the sink is exactly-once end to end.
    */
  def ingestSinkVectors(stream: DataFrame, storeDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendVectors(batch, storeDir, batchId, Some(checkpoint))
        ()
      }
      .start()

  /** X3c''''' [EXT] — log-driven ingestion under the hash gate: the
    * corpus arrives as two micro-batch deltas (the base subset cold-
    * starts the centroids, the rest upserts against them frozen), an
    * exact re-delivery under a replayed id must skip and under a fresh
    * id must noop, and the corpus-driven fingerprint check over the
    * full table must then find NOTHING to do — the two disciplines
    * agree bit-for-bit. Final index state is identical to
    * [[x3AnnIvfIncremental]]'s, so it shares that row's DuckDB twin
    * ([[Similarity.x3AnnIvfIncSql]]).
    */
  def x3AnnIvfIngest(s: SparkSession, dir: String): DataFrame = {
    // base-store methodology — see [[x3AnnIvfIncremental]]: the
    // cold-start batch (centroid training on micro-batch 0) is the
    // stream's one-time bootstrap, built once per JVM; every invocation
    // still runs the frozen-centroid upsert, the replay skip, the exact
    // re-delivery noop, and the corpus-driven cross-check in full
    val base = StoreDirs.cachedBaseStore(s"ivfingest:$dir") { st =>
      val m0 = appendVectors(
        Tables.embeddings(s, dir).filter(col("vec_id") % 7 =!= 0), st, 0L)
      require(m0 == "ingest-initial", s"expected the cold start, ran '$m0'")
    }
    StoreDirs.withTempStore("graft-ivfingest") { store =>
      StoreDirs.copyStore(s, base, store)
      val emb = Tables.embeddings(s, dir)
      val m1 = appendVectors(emb.filter(col("vec_id") % 7 === 0), store, 1L)
      require(m1 == "ingest", s"expected the frozen-centroid upsert, ran '$m1'")
      val m1r = appendVectors(emb.limit(5), store, 1L)
      require(m1r == "skip", s"replayed micro-batch id ran '$m1r'")
      val m2 = appendVectors(emb.filter(col("vec_id") % 7 === 0), store, 2L)
      require(m2 == "noop", s"exact re-delivery ran '$m2'")
      val cross = ensureCurrentIncremental(s, dir, store)
      require(cross == "noop", s"log-driven store drifted from the corpus: '$cross'")
      probe(s, dir, store).localCheckpoint()
    }
  }
}
