package graft

import org.apache.spark.sql.functions._

/** Round-12 regressions — the four ADVICE r11 findings:
  * the compaction crash-window eviction bug (medium), the
  * [[graft.sources.Sinks.compact]] swap-restore-on-throw, the
  * exact (uncapped) in-batch pre-filter of the eviction gate, and the
  * owner-token process scoping (tested in Round11Spec alongside the
  * other fence tests).
  */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------
  // ADVICE r11 (medium): a tombstone surviving a crash between the
  // compacted base publish and the tombstone delete must stay a no-op —
  // a doc evicted at E and re-admitted at B > E keeps vetoing, and the
  // next compaction must NOT drop its signature state.
  // ---------------------------------------------------------------

  test("BandStore: a crash-leftover tombstone cannot mute or destroy a re-admitted doc's state") {
    import graft.streaming.BandStore
    val root = tmpDir("r12-crashwin")
    val store = s"$root/store"
    val admitted = s"$root/admitted"
    def text(tag: String, i: Int) =
      (0 until 25).map(j => s"${tag}_w${i}_$j").mkString(" ")
    def frame(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    def admittedIn(b: Long): Set[Long] = spark.read.parquet(admitted)
      .filter(col("__batch") === b)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // corpus adopted at batch 0; doc 3 evicted at batch 1; the SAME id
    // re-admitted at batch 2 (its only peer is its own masked past)
    BandStore.importCorpus(frame((0 until 20).map(i => (i.toLong, text("a", i)))), 0L, store)
    BandStore.evictDocs(Seq(3L).toDF("doc_id"), 1L, store)
    BandStore.admitBatch(frame(Seq((3L, text("a", 3)))), 2L, store, admitted)
    assert(admittedIn(2L) == Set(3L), "the evicted id must be re-admittable")

    // full compaction: batches 0 and 2 fold into base −1, tombstone 1 is
    // absorbed and deleted
    BandStore.compactStore(spark, store, minLiveBatch = 3L)
    // CRASH SIMULATION: the delete is the last step — re-planting the
    // tombstone partition reproduces exactly the state a crash between
    // the base publishes and the tombstone delete leaves behind
    BandStore.evictDocs(Seq(3L).toDF("doc_id"), 1L, store)

    // (a) the doc's folded rows must still OUTRANK the stale tombstone:
    // a copy of its text is vetoed, not admitted
    BandStore.admitBatch(frame(Seq((200L, text("a", 3)))), 3L, store, admitted)
    assert(admittedIn(3L).isEmpty,
      "a re-admitted doc must keep vetoing across a crash-leftover tombstone")

    // (b) the next compaction's re-absorb must keep the rows (the old
    // `__batch`-ranked gate dropped them for good here) and clear the
    // leftover tombstone
    BandStore.compactStore(spark, store, minLiveBatch = 4L)
    val sigs = spark.read.parquet(BandStore.sigsDir(store))
    assert(sigs.filter(col("doc_id") === 3L).count() == 1,
      "the re-admitted doc's signature state must survive the re-absorb")
    assert(sigs.filter(col("doc_id") === 3L).select("__obatch")
      .head.getLong(0) == 2L,
      "the per-row original batch must ride through both compactions verbatim")
    assert(!new java.io.File(BandStore.evictedDir(store)).exists() ||
      Option(new java.io.File(BandStore.evictedDir(store)).listFiles())
        .getOrElse(Array.empty).forall(f => !f.getName.startsWith("__batch=")),
      "the leftover tombstone must be absorbed")
    // and the veto still stands afterwards
    BandStore.admitBatch(frame(Seq((201L, text("a", 3)))), 4L, store, admitted)
    assert(admittedIn(4L).isEmpty, "the veto must survive the re-absorb")
  }

  // ---------------------------------------------------------------
  // ADVICE r11: Sinks.compact's second rename THROWING (not returning
  // false) must restore the moved-aside original, never leave the store
  // path missing.
  // ---------------------------------------------------------------

  private def localFs(): org.apache.hadoop.fs.RawLocalFileSystem = {
    val fs = new org.apache.hadoop.fs.RawLocalFileSystem()
    fs.initialize(java.net.URI.create("file:///"), new org.apache.hadoop.conf.Configuration())
    fs
  }

  test("Sinks.swapIn: a throwing swap rename restores the original; a false swap rename still does") {
    import org.apache.hadoop.fs.Path
    val root = tmpDir("r12-swap")
    val path = new Path(s"$root/store")
    val staging = new Path(s"$root/.store-compact-x")
    val old = new Path(s"$root/.store-old-x")
    def seed(): Unit = {
      // the state compact() reaches before the swap: original moved
      // aside to `old`, rewrite complete in `staging`, store path absent
      new java.io.File(old.toString).mkdirs()
      java.nio.file.Files.write(java.nio.file.Paths.get(old.toString, "data"),
        "original".getBytes("UTF-8"))
      new java.io.File(staging.toString).mkdirs()
    }
    seed()
    val plain = localFs()
    val throwing = new org.apache.hadoop.fs.RawLocalFileSystem() {
      override def rename(src: Path, dst: Path): Boolean =
        if (src.getName == staging.getName) throw new java.io.IOException("injected rename failure")
        else super.rename(src, dst)
    }
    throwing.initialize(java.net.URI.create("file:///"), new org.apache.hadoop.conf.Configuration())
    val e = intercept[java.io.IOException] {
      graft.sources.Sinks.swapIn(throwing, staging, path, old)
    }
    assert(e.getMessage == "injected rename failure")
    assert(plain.exists(path) &&
      java.nio.file.Files.exists(java.nio.file.Paths.get(path.toString, "data")),
      "a throwing swap must put the original back at the store path")
    // the false branch keeps its restore too
    plain.delete(path, true)
    seed()
    val refusing = new org.apache.hadoop.fs.RawLocalFileSystem() {
      override def rename(src: Path, dst: Path): Boolean =
        if (src.getName == staging.getName) false else super.rename(src, dst)
    }
    refusing.initialize(java.net.URI.create("file:///"), new org.apache.hadoop.conf.Configuration())
    val e2 = intercept[IllegalStateException] {
      graft.sources.Sinks.swapIn(refusing, staging, path, old)
    }
    assert(e2.getMessage.contains("could not swap"), e2.getMessage)
    assert(plain.exists(path), "a refused swap must put the original back")
  }

  // ---------------------------------------------------------------
  // ADVICE r11: the eviction gate's in-batch pre-filter must be EXACT —
  // past the bucket cap, cappedSelfPairs yields a strict subset of the
  // all-pairs set the DuckDB twin computes.
  // ---------------------------------------------------------------

  test("exactSelfPairs returns all colliding pairs where the capped path under-reports") {
    import graft.operators.Dedup
    // one hot (band, bh) bucket of five ids — over a cap of 3
    val bands = (1L to 5L).map(i => (i, 0, 77L)).toDF("doc_id", "band", "bh")
    val exact = Dedup.exactSelfPairs(bands, "doc_id", "a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == (for { a <- 1L to 5L; b <- (a + 1) to 5L } yield (a, b)).toSet,
      "the exact form must produce every ordered colliding pair")
    val capped = Dedup.cappedSelfPairs(bands, "doc_id", 3, "a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(exact) && capped.size < exact.size,
      "past the cap the guarded path under-reports — exactly why the " +
        "hash-gated pre-filter must not use it")
  }
}
