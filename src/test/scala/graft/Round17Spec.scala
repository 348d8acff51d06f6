package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-17 pins — the ADVICE r16 findings and VERDICT r16 #2, one
  * invariant per test:
  *   - a mis-seeded FLAT marker over a bucketed batch is never taken as
  *     a subset-fold source (the `exists` fix: the old `forall` folded
  *     only the slice's rows but retired the whole batch dir — data
  *     loss for the other buckets at the reap);
  *   - the manifest seed is atomic (tmp-dir + rename): readers never
  *     see a partial marker set, and crash debris (`.live.tmp-`) is
  *     invisible to readers and purged by the next fenced compaction;
  *   - retired-log age binds to the FILESYSTEM's modification time,
  *     not the retirer's embedded wall clock (clock-skew erosion);
  *   - the evicted-tree absorb (retire+reap) runs under a fence — a
  *     live holder makes a late pass fail loudly instead of
  *     interleaving with its orphan scan;
  *   - the retire grace is DERIVED: the store gauges its slowest
  *     admission wall and reaps bind to max(conf, 2× gauge), so a probe
  *     outliving a misconfigured constant cannot lose files.
  */
class Round17Spec extends SparkSpec {
  import spark.implicits._
  import graft.streaming.BandStore

  private def tokens(tag: String, n: Int): String =
    (0 until 25).map(j => s"${tag}_w${n}_$j").mkString(" ")

  private def frame(docs: Seq[(Long, String)]): DataFrame =
    docs.toDF("doc_id", "text")

  private def batchDirsOnDisk(dir: String): Set[String] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("__batch="))
      .map(_.getName).toSet

  // __batch=-prefixed only: Hadoop's LocalFileSystem hides its .crc
  // sidecars from fs.listStatus (so the engine never sees them), but a
  // raw java.io listing shows them
  private def markerNames(dir: String): Set[String] =
    Option(new java.io.File(dir, ".live").listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith("__batch=")).toSet

  private def bandRows(dir: String): Set[String] =
    BandStore.readLive(spark, dir)
      .selectExpr("concat_ws(':', doc_id, band, bh)")
      .collect().map(_.getString(0)).toSet

  test("a flat marker over a bucketed batch is never a subset-fold source: its rows survive slices and fold only in the full pass") {
    val (store, out) = (tmpDir("r17-flat"), tmpDir("r17-flat-out"))
    (0 until 3).foreach { b =>
      BandStore.admitBatch(
        frame((0 until 12).map(i => ((b * 100 + i).toLong, tokens(s"f$b", i)))),
        b.toLong, store, out)
    }
    val bands = BandStore.bandsDir(store)
    val before = bandRows(bands)
    // simulate the ADVICE r16 mis-seed: batch 1's per-bucket markers
    // replaced by one FLAT marker (`__batch=1`) over a physically
    // BUCKETED dir — the state a misread child listing used to produce
    val live = new java.io.File(bands, ".live")
    live.listFiles().filter(_.getName.startsWith("__batch=1%%"))
      .foreach(f => assert(f.delete()))
    assert(new java.io.File(live, "__batch=1").createNewFile())
    assert(BandStore.liveBatchIds(spark, bands).toSet == Set(0L, 1L, 2L))

    // subset folds must leave the flat-marked batch completely alone
    withConf(BandStore.RetireGraceConf -> "0") {
      BandStore.compactSlices(spark, store, Long.MaxValue)
    }
    // reap everything retired; watermark 1 keeps the orphan pass off the
    // hand-flattened batch (its per-bucket leaves are marker-less by
    // construction of the surgery, not by any engine action)
    BandStore.reapRetired(spark, store, 0L, minLiveBatch = 1L)
    assert(markerNames(bands).contains("__batch=1"),
      "subset folds must not retire a flat-marked batch")
    assert(batchDirsOnDisk(bands).contains("__batch=1"),
      "the flat-marked batch dir must survive subset folds intact")
    assert(bandRows(bands) == before,
      "no row may be lost while a flat marker shadows a bucketed batch")

    // the FULL pass is where flat leaves fold — and nothing is lost
    withConf(BandStore.RetireGraceConf -> "0") {
      BandStore.compactStore(spark, store)
    }
    BandStore.reapRetired(spark, store, 0L)
    assert(!markerNames(bands).contains("__batch=1"),
      "the full pass must fold and retire the flat leaf")
    assert(bandRows(bands) == before,
      "the full fold must preserve the row set exactly")
  }

  test("manifest seed is atomic: .live.tmp- crash debris is reader-invisible, re-seeded over, and purged by the next fenced compaction") {
    val (store, out) = (tmpDir("r17-seed"), tmpDir("r17-seed-out"))
    (0 until 2).foreach { b =>
      BandStore.admitBatch(
        frame((0 until 6).map(i => ((b * 100 + i).toLong, tokens(s"s$b", i)))),
        b.toLong, store, out)
    }
    val bands = BandStore.bandsDir(store)
    val before = bandRows(bands)
    // downgrade to a legacy store, then simulate a seed that crashed
    // mid-marker-creation: a PARTIAL tmp dir and no .live
    def delTree(x: java.io.File): Unit = {
      Option(x.listFiles()).getOrElse(Array.empty).foreach(delTree); x.delete()
    }
    delTree(new java.io.File(bands, ".live"))
    val tmp = new java.io.File(bands, ".live.tmp-crashed")
    assert(tmp.mkdirs())
    assert(new java.io.File(tmp, "__batch=0%%__bb=0").createNewFile())
    // readers: no manifest → legacy listing fallback; the partial tmp is
    // NOT a manifest (the old in-place seed would have exposed exactly
    // this deficit as `.live`)
    assert(BandStore.readManifest(spark, bands).isEmpty,
      "a crashed seed's tmp dir must never read as a manifest")
    assert(BandStore.liveBatchIds(spark, bands).toSet == Set(0L, 1L))
    // the next seed publishes a COMPLETE manifest in one rename
    BandStore.ensureManifest(spark, bands)
    val expected = batchDirsOnDisk(bands).flatMap { bd =>
      new java.io.File(bands, bd).listFiles()
        .filter(f => f.isDirectory && f.getName.contains("="))
        .map(c => s"$bd%%${c.getName}")
    }
    assert(markerNames(bands) == expected,
      "the seed must cover every physical (batch, bucket) leaf exactly")
    assert(bandRows(bands) == before, "seeding must not change content")
    // the abandoned tmp dir is fenced-compaction debris
    assert(tmp.exists())
    withConf(BandStore.RetireGraceConf -> "0") {
      BandStore.compactStore(spark, store)
    }
    assert(!tmp.exists(), "compaction must purge crashed-seed tmp dirs")
    assert(bandRows(bands) == before)
  }

  test("retired-log age binds to filesystem mtime, not the retirer's embedded timestamp (clock skew cannot shorten the grace)") {
    val (store, out) = (tmpDir("r17-skew"), tmpDir("r17-skew-out"))
    (0 until 2).foreach { b =>
      BandStore.admitBatch(
        frame((0 until 6).map(i => ((b * 100 + i).toLong, tokens(s"k$b", i)))),
        b.toLong, store, out)
    }
    val bands = BandStore.bandsDir(store)
    withConf(BandStore.RetireGraceConf -> "600000") {
      BandStore.compactStore(spark, store)
    }
    val logs = new java.io.File(bands).listFiles()
      .filter(_.getName.startsWith(".retired-"))
    assert(logs.nonEmpty, "the fold must have produced a retire log")
    val retiredDirs = batchDirsOnDisk(bands).filter(d => d != "__batch=-1")
    assert(retiredDirs.nonEmpty, "sources must still be grace-deferred")

    // a retirer whose clock ran 10 minutes AHEAD embeds a filename
    // timestamp that (old code) looked 10 minutes stale the moment it
    // was written — the fresh mtime must keep the window open
    val skewed = new java.io.File(logs.head.getParentFile,
      s".retired-${System.currentTimeMillis() - 600000L}-skewedahead")
    assert(logs.head.renameTo(skewed))
    BandStore.reapRetired(spark, store, 300000L)
    assert(batchDirsOnDisk(bands).filter(_ != "__batch=-1") == retiredDirs,
      "a skewed-ahead filename timestamp must not shorten the grace")
    // and once the FILE is genuinely old (mtime in the past), it reaps
    // even though the filename claims it was written just now
    val young = new java.io.File(skewed.getParentFile,
      s".retired-${System.currentTimeMillis()}-skewedbehind")
    assert(skewed.renameTo(young))
    assert(young.setLastModified(System.currentTimeMillis() - 600000L))
    BandStore.reapRetired(spark, store, 300000L)
    assert(batchDirsOnDisk(bands) == Set("__batch=-1"),
      "a genuinely old log must reap whatever its filename claims")
  }

  test("the evicted-tree absorb runs fenced: a live holder makes the late pass fail loudly") {
    val (store, out) = (tmpDir("r17-efence"), tmpDir("r17-efence-out"))
    (0 until 2).foreach { b =>
      BandStore.admitBatch(
        frame((0 until 8).map(i => ((b * 100 + i).toLong, tokens(s"e$b", i)))),
        b.toLong, store, out)
    }
    // tombstones that a full pass will absorb
    BandStore.evictDocs(Seq(0L, 1L).toDF("doc_id"), 2L, store)
    val evicted = BandStore.evictedDir(store)
    val fence = new java.io.File(evicted,
      s".fence-${BandStore.EvictMaintGen}")
    assert(fence.createNewFile(), s"could not plant $fence")
    try {
      val e = intercept[IllegalStateException] {
        withConf(BandStore.RetireGraceConf -> "0") {
          BandStore.compactStore(spark, store)
        }
      }
      assert(e.getMessage.contains("concurrent writer"),
        s"unexpected failure: ${e.getMessage}")
    } finally fence.delete()
    // with the holder gone the absorb completes and reclaims the
    // tombstone partitions
    withConf(BandStore.RetireGraceConf -> "0") {
      BandStore.compactStore(spark, store)
    }
    BandStore.reapRetired(spark, store, 0L)
    assert(batchDirsOnDisk(evicted).isEmpty,
      "the absorbed tombstone partitions must reclaim after the fence clears")
  }

  test("the retire grace derives from the gauged slowest probe: a tiny conf cannot reap under a measured long reader") {
    val (store, out) = (tmpDir("r17-gauge"), tmpDir("r17-gauge-out"))
    (0 until 3).foreach { b =>
      BandStore.admitBatch(
        frame((0 until 6).map(i => ((b * 100 + i).toLong, tokens(s"w$b", i)))),
        b.toLong, store, out)
    }
    // admission recorded its wall
    val gauged = BandStore.maxProbeWallMs(spark, store)
    assert(gauged > 0L, "admitBatch must gauge its wall")
    // a deployment whose probes run 5 minutes: the gauge, not the conf,
    // must bind the reap
    BandStore.recordProbeWall(spark, store, 300000L)
    assert(BandStore.maxProbeWallMs(spark, store) == 300000L)
    withConf(BandStore.RetireGraceConf -> "1") {
      assert(BandStore.effectiveRetireGraceMs(spark, store) == 600000L,
        "effective grace must be 2x the gauged max probe wall")
      BandStore.compactStore(spark, store)
    }
    val bands = BandStore.bandsDir(store)
    // conf said 1 ms — but the derived grace kept the sources on disk
    assert(batchDirsOnDisk(bands).exists(_ != "__batch=-1"),
      "retired sources must survive: the derived grace binds, not the conf")
    // the monotone gauge never narrows
    BandStore.recordProbeWall(spark, store, 5L)
    assert(BandStore.maxProbeWallMs(spark, store) == 300000L)
    // explicit quiesce reap (grace 0) stays available to operators/tests
    BandStore.reapRetired(spark, store, 0L)
    assert(batchDirsOnDisk(bands) == Set("__batch=-1"))
  }
}
