package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** [EXT] Materialized IVF ANN INDEX — the [[LabelStore]] generational
  * discipline applied to [[Similarity.x3AnnIvf]]'s index half.
  *
  * Why it exists: `x3_ann_ivf` rebuilds the whole index inside every
  * query — seed sample, Lloyd refinement, argmax assignment of every
  * corpus vector. That is the right shape for an oracle-checked query
  * and the wrong one for production ANN serving, where the index is
  * built once per corpus version and probed by many queries. At 100 TB
  * the assignment pass alone is a full corpus scan per query.
  *
  * Layout: `storeDir/gen=<k>__n=<count>__fp=<digest>/` holding TWO
  * tables published by the SAME atomic rename:
  *   - `centroids/` — (c_id, ce), [[Similarity.IvfNList]] rows,
  *     broadcast-sized at any corpus scale;
  *   - `lists/` — the inverted lists (vec_id, e, norm) PARTITIONED BY
  *     `c_id`, so a probe's scan reads only the `nprobe` cells its
  *     queries select (partition pruning, asserted in Round8Spec) —
  *     the nprobe/nlist cost fraction the IVF design promises is in
  *     the STORAGE LAYOUT, not just the plan.
  * The corpus fingerprint (row count + order-insensitive bit_xor of
  * per-vector hashes) rides in the generation name; [[ensureCurrent]]
  * re-fingerprints and rebuilds on mismatch — validity by measurement.
  * The newest two generations stay live (the LabelStore/BandStore
  * retirement idiom), so a reader that resolved just before a
  * concurrent rebuild never scans a retired path.
  *
  * Determinism: every stage of the index build is bit-deterministic
  * (md5 seed order, exact decimal centroid means), and parquet round-
  * trips doubles losslessly — so [[probe]] over a current store equals
  * the self-contained query bit-for-bit, and `x3_ann_ivf_store` runs
  * under the SAME DuckDB oracle as `x3_ann_ivf`.
  */
object IvfStore {

  /** (row count, order-insensitive digest) over the embeddings table —
    * xxhash64 spans vec_id and the float array, so any vector edit
    * invalidates.
    */
  private[graft] def fingerprint(s: SparkSession, dir: String): (Long, Long) = {
    val r = Tables.embeddings(s, dir)
      .agg(count(lit(1)), expr("bit_xor(xxhash64(vec_id, embedding))")).head
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

  /** Unconditionally (re)build the index from the corpus at `dir` and
    * publish it as a new generation.
    */
  def build(s: SparkSession, dir: String, storeDir: String): Unit = {
    val (n, fp) = fingerprint(s, dir)
    val e = Similarity.normed(s, dir).persist()
    val (cent, lists) = Similarity.ivfIndex(e)
    try {
      val root = new Path(storeDir)
      val fs = fsOf(s, root)
      fs.mkdirs(root)
      val gens = listGens(s, storeDir)
      val next = gens.lastOption.map(_.k).getOrElse(0L) + 1
      val staging = new Path(root, s".staging-$next")
      cent.write.mode(SaveMode.Overwrite).parquet(s"$staging/centroids")
      lists.write.mode(SaveMode.Overwrite).partitionBy("c_id").parquet(s"$staging/lists")
      val pub = new Path(root,
        s"gen=${next}__n=${n}__fp=${java.lang.Long.toHexString(fp)}")
      require(fs.rename(staging, pub), s"IvfStore: could not publish $pub")
      gens.dropRight(1).foreach { g =>
        fs.rename(g.path, new Path(root, "." + g.path.getName + ".retired"))
      }
    } finally { cent.unpersist(); e.unpersist() }
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

  private def latest(s: SparkSession, storeDir: String): Path = {
    val gens = listGens(s, storeDir)
    require(gens.nonEmpty, s"IvfStore: no published generation under $storeDir")
    gens.last.path
  }

  /** The query half of [[Similarity.x3AnnIvf]] served from the store:
    * centroids load broadcast-sized, the probed cell ids collect
    * driver-side (≤ [[Similarity.IvfNList]] values — bounded by the
    * cell count, never the data), and the lists scan carries a
    * partition filter on exactly those cells. No corpus-wide stage
    * remains in the query path.
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
    val cent = s.read.parquet(s"$gen/centroids")
    val queries = Similarity.normed(s, dir).filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("norm").as("qnorm"))
    val qCells = Similarity.ivfQueryCells(cent, queries)
    val probed = qCells.select(col("c_id")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val lists = s.read.parquet(s"$gen/lists").filter(col("c_id").isin(probed: _*))
    (qCells, lists)
  }

  /** X3c' [EXT] — the store round trip under the hash gate: build the
    * index, serve the probe from it. Same oracle as `x3_ann_ivf` (the
    * build is bit-deterministic and parquet round-trips doubles
    * losslessly), so a store/serve divergence fails the hash compare.
    */
  def x3AnnIvfStore(s: SparkSession, dir: String): DataFrame = {
    val store = java.nio.file.Files
      .createTempDirectory("graft-ivfstore").toString + "/store"
    build(s, dir, store)
    probe(s, dir, store)
  }
}
