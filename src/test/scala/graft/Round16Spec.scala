package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-16 pins: manifest-pinned BandStore reads (VERDICT r15 #2).
  *
  * Round7Spec's concurrency test proves the integration property (zero
  * admission retries under a racing compactor); these pin the manifest
  * mechanics one at a time so a regression names its own invariant:
  * retirement defers physical deletion for the grace window, the reap
  * honors pending windows, crashed-publish orphans reconcile only below
  * the watermark, and a legacy (manifest-less) store seeds at its first
  * write without changing its visible content.
  */
class Round16Spec extends SparkSpec {
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

  private def markerNames(dir: String): Set[String] =
    Option(new java.io.File(dir, ".live").listFiles()).getOrElse(Array.empty)
      .map(_.getName).toSet

  test("retirement is manifest-only: retired leaves stay on disk through the grace window, invisible to live reads, then reap") {
    val (store, out) = (tmpDir("r16-grace"), tmpDir("r16-grace-out"))
    (0 until 3).foreach { b =>
      BandStore.admitBatch(
        frame((0 until 6).map(i => ((b * 100 + i).toLong, tokens(s"g$b", i)))),
        b.toLong, store, out)
    }
    val bands = BandStore.bandsDir(store)
    val preDirs = batchDirsOnDisk(bands)
    assert(preDirs == Set("__batch=0", "__batch=1", "__batch=2"), s"got $preDirs")

    // compact batches < 2 under a LONG grace: physical dirs must survive
    withConf(BandStore.RetireGraceConf -> "600000") {
      BandStore.compactStore(spark, store, minLiveBatch = 2L)
    }
    val postDirs = batchDirsOnDisk(bands)
    // sources 0,1 still on disk (grace-deferred), base -1 published
    assert(postDirs == Set("__batch=-1", "__batch=0", "__batch=1", "__batch=2"),
      s"retired sources must outlive the retirement by the grace: $postDirs")
    // but the LIVE view switched atomically: only the base and batch 2
    assert(BandStore.liveBatchIds(spark, bands).toSet == Set(-1L, 2L),
      "manifest must show base + live batch only")
    // the live read sees each row exactly once (no superset leak from
    // the still-on-disk sources)
    val live = BandStore.readLive(spark, bands).select("doc_id", "band", "bh")
    assert(live.count() == live.distinct().count(),
      "live read must not double-count grace-deferred retired leaves")

    // a reap WITHIN the grace is a no-op; at grace 0 it reclaims
    BandStore.reapRetired(spark, store, 600000L)
    assert(batchDirsOnDisk(bands) == postDirs, "reap ignored the grace window")
    BandStore.reapRetired(spark, store, 0L)
    assert(batchDirsOnDisk(bands) == Set("__batch=-1", "__batch=2"),
      "grace-0 reap must reclaim the retired sources")
    // content is unchanged by the physical reclaim
    val after = BandStore.readLive(spark, bands).select("doc_id", "band", "bh")
    assert(after.count() == live.count(), "reap changed the live row count")
  }

  test("orphan reconciliation: a crashed publish (markerless dir) reaps below the watermark and is never read; live-batch dirs are never touched") {
    val (store, out) = (tmpDir("r16-orphan"), tmpDir("r16-orphan-out"))
    (0 until 2).foreach { b =>
      BandStore.admitBatch(
        frame((0 until 5).map(i => ((b * 100 + i).toLong, tokens(s"o$b", i)))),
        b.toLong, store, out)
    }
    val bands = BandStore.bandsDir(store)
    // simulate a publish that crashed before its marker landed: the dir
    // exists, the manifest has never heard of it
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(bands)
    val fs = p.getFileSystem(conf)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(p, "__batch=0"), fs,
      new org.apache.hadoop.fs.Path(p, "__batch=-1"), false, conf)
    assert(batchDirsOnDisk(bands).contains("__batch=-1"))
    // invisible: neither the live ids nor the read see the orphan
    assert(BandStore.liveBatchIds(spark, bands).toSet == Set(0L, 1L))
    assert(BandStore.readLive(spark, bands)
      .filter(col("__batch") === -1L).count() == 0,
      "a markerless dir must never be read")
    // a reap whose watermark does NOT cover the orphan leaves it alone;
    // the live batches (markers present) are untouched either way
    BandStore.reapRetired(spark, store, 0L, minLiveBatch = -1L)
    assert(batchDirsOnDisk(bands).contains("__batch=-1"),
      "an orphan at/above the watermark must be left alone")
    BandStore.reapRetired(spark, store, 0L)
    assert(batchDirsOnDisk(bands) == Set("__batch=0", "__batch=1"),
      "the below-watermark orphan must reconcile; live dirs must survive")
    assert(BandStore.liveBatchIds(spark, bands).toSet == Set(0L, 1L))
  }

  test("legacy store seeds its manifest at the first write with content unchanged") {
    val (store, out) = (tmpDir("r16-legacy"), tmpDir("r16-legacy-out"))
    (0 until 2).foreach { b =>
      BandStore.admitBatch(
        frame((0 until 5).map(i => ((b * 100 + i).toLong, tokens(s"l$b", i)))),
        b.toLong, store, out)
    }
    val bands = BandStore.bandsDir(store)
    val sigs = BandStore.sigsDir(store)
    val before = BandStore.readLive(spark, bands)
      .selectExpr("concat_ws(':', doc_id, band, bh)")
      .collect().map(_.getString(0)).toSet
    // simulate a pre-manifest store: drop the .live dirs outright
    Seq(bands, sigs).foreach { d =>
      val f = new java.io.File(d, ".live")
      def del(x: java.io.File): Unit = {
        Option(x.listFiles()).getOrElse(Array.empty).foreach(del); x.delete()
      }
      del(f)
      assert(!f.exists())
    }
    // manifest-less reads fall back to the directory listing
    assert(BandStore.liveBatchIds(spark, bands).toSet == Set(0L, 1L))
    // the next WRITE seeds the manifest from the physical listing
    BandStore.admitBatch(
      frame(Seq((500L, tokens("lx", 1)))), 2L, store, out)
    assert(new java.io.File(bands, ".live").exists(),
      "first write after the downgrade must seed the manifest")
    assert(BandStore.liveBatchIds(spark, bands).toSet == Set(0L, 1L, 2L))
    val after = BandStore.readLive(spark, bands)
      .filter(col("__batch") =!= 2L)
      .selectExpr("concat_ws(':', doc_id, band, bh)")
      .collect().map(_.getString(0)).toSet
    assert(after == before, "seeding must not change the visible content")
  }

  test("probe listing is bucket-narrowed: a one-bucket probe enumerates only that bucket's live leaves") {
    val (store, out) = (tmpDir("r16-narrow"), tmpDir("r16-narrow-out"))
    (0 until 3).foreach { b =>
      BandStore.admitBatch(
        frame((0 until 20).map(i => ((b * 100 + i).toLong, tokens(s"n$b", i)))),
        b.toLong, store, out)
    }
    val bands = BandStore.bandsDir(store)
    val oneBucket = spark.read.parquet(bands)
      .select(col("__bb").cast("int")).head().getInt(0)
    val probe = BandStore.probeScan(spark, store, Seq(oneBucket), 9L)
    // the scan's file index holds ONLY the touched bucket's leaves — at
    // most one per live batch — instead of every leaf in the tree
    val rootPaths = probe.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten
    assert(rootPaths.nonEmpty && rootPaths.forall(_.contains(s"__bb=$oneBucket")),
      s"probe listed untouched buckets: ${rootPaths.take(5)}")
    assert(rootPaths.size <= 3, s"more root paths than live batches: $rootPaths")
  }
}
