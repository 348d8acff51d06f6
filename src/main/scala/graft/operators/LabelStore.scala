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

  /** (row count, order-insensitive digest) of the corpus the labels
    * derive from. bit_xor over per-doc xxhash64(doc_id, text): one
    * narrow scan, no shuffle beyond the scalar aggregate, and XOR
    * cannot overflow under ANSI mode.
    */
  private[graft] def fingerprint(s: SparkSession, dir: String): (Long, Long) = {
    val r = Tables.documents(s, dir)
      .agg(count(lit(1)), expr("bit_xor(xxhash64(doc_id, text))")).head
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

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

  /** Unconditionally (re)build the store from the corpus at `dir`:
    * runs the full [[Dedup.x2DupClusters]] pipeline once and publishes
    * the labels as a new generation.
    */
  def build(s: SparkSession, dir: String, storeDir: String): Unit = {
    val (n, fp) = fingerprint(s, dir)
    val root = new Path(storeDir)
    val fs = fsOf(s, root)
    fs.mkdirs(root)
    val gens = listGens(s, storeDir)
    val next = gens.lastOption.map(_.k).getOrElse(0L) + 1
    val staging = new Path(root, s".staging-$next")
    Dedup.x2DupClusters(s, dir)
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)
    val pub = new Path(root,
      s"gen=${next}__n=${n}__fp=${java.lang.Long.toHexString(fp)}")
    require(fs.rename(staging, pub), s"LabelStore: could not publish $pub")
    // retire everything older than the previous latest — keep two live
    // generations so a reader that resolved just before this publish
    // still scans existing files
    gens.dropRight(1).foreach { g =>
      fs.rename(g.path, new Path(root, "." + g.path.getName + ".retired"))
    }
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
