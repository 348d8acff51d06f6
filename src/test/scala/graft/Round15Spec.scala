package graft

import org.apache.spark.sql.functions._

/** Round-15 pins: the init-claim lease hardening (ADVICE r14 — O_EXCL
  * on file:, rename-based stale reclaim, liveness probe before reclaim,
  * per-lease wait logging), the sampled IVF training path (VERDICT r14
  * #1), and the incremental band-store compaction (VERDICT r14 #3).
  */
class Round15Spec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------
  // ADVICE r14 (medium ×3): the upsert store's init claim. A stale
  // claim with no write activity is dead debris — reclaimed by atomic
  // RENAME (one winner among racing reclaimers), and the reclaimer
  // proceeds as the initial writer. A stale claim WITH fresh write
  // activity under the store path belongs to a live writer whose bulk
  // Overwrite outlived the lease — it must never be reclaimed (two
  // concurrent Overwrites on one path); the waiter fails loudly.
  // ---------------------------------------------------------------

  test("L5 init claim: stale claim with no store activity is reclaimed by rename; the writer goes initial and leaves no debris") {
    import graft.sources.Sinks
    val root = tmpDir("r15-init-stale")
    val store = s"$root/store"
    val claim = java.nio.file.Paths.get(root, ".store.init")
    java.nio.file.Files.createFile(claim)
    java.nio.file.Files.setLastModifiedTime(claim,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 10000))
    withProps("graft.store.fence.restartMs" -> "500") {
      Sinks.upsertByKey(Seq((1L, 1L, "a")).toDF("off", "id", "v"), "id", "off", store)
    }
    assert(spark.read.parquet(store).count() == 1)
    assert(!java.nio.file.Files.exists(claim),
      "the initial writer releases its claim after the write")
    val debris = Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(".store.init.reclaim-"))
    assert(debris.isEmpty, s"reclaim rename debris left behind: ${debris.toSeq}")
  }

  test("L5 init claim: a stale claim with RECENT write activity under the store is a live writer's — never reclaimed; the waiter fails loudly") {
    import graft.sources.Sinks
    val root = tmpDir("r15-init-live")
    val store = s"$root/store"
    val claim = java.nio.file.Paths.get(root, ".store.init")
    java.nio.file.Files.createFile(claim)
    java.nio.file.Files.setLastModifiedTime(claim,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 10000))
    // simulate the live winner mid-Overwrite: a _temporary commit tree
    // under the store path whose newest mtime keeps advancing
    val tmpTree = java.nio.file.Paths.get(store, "_temporary")
    java.nio.file.Files.createDirectories(tmpTree)
    val part = tmpTree.resolve("part-00000")
    @volatile var touching = true
    val toucher = new Thread(() => {
      while (touching) {
        java.nio.file.Files.writeString(part, System.nanoTime().toString)
        Thread.sleep(100)
      }
    })
    toucher.setDaemon(true)
    toucher.start()
    try {
      withProps("graft.store.fence.restartMs" -> "300",
                "graft.store.fence.staleMs" -> "1500") {
        val e = intercept[IllegalStateException] {
          Sinks.upsertByKey(Seq((1L, 1L, "a")).toDF("off", "id", "v"),
            "id", "off", store)
        }
        assert(e.getMessage.contains("init claim"), e.getMessage)
      }
      assert(java.nio.file.Files.exists(claim),
        "a claim with live write activity behind it must never be reclaimed")
    } finally { touching = false; toucher.join(2000) }
  }

  // ---------------------------------------------------------------
  // VERDICT r14 #1: IVF centroid training runs on the md5-rank
  // IvfTrainSample prefix, not the corpus — so a full re-train is
  // O(sample) training + one assignment pass. The law this rests on:
  // centroids from a large corpus EQUAL centroids from its md5-prefix
  // subset (bit-identical — the same exact-decimal Lloyd pipeline over
  // the same rows), while the inverted lists still cover every vector.
  // At fixture scale (≤ 2000 vectors < 8192) the sample is the corpus,
  // so the five x3_ann_ivf* oracle rows pin backward equality.
  // ---------------------------------------------------------------

  test("IVF sampled training: centroids from a 10k corpus equal centroids from its md5-rank 8192-prefix; lists cover the full corpus") {
    import graft.operators.{Caches, Similarity}
    val emb = spark.range(10000).select(col("id").as("vec_id"),
      expr("""transform(sequence(0, 63), j ->
             |  CAST(CAST(pmod(xxhash64(id * 97 + j), 1000) AS DOUBLE) / 1000.0 - 0.5 AS FLOAT))"""
        .stripMargin).as("embedding"))
    try {
      val e = Similarity.normedOf(emb)
      val (cent, lists) = Similarity.ivfIndex(e)
      val prefix = e.withColumn("h", md5(col("vec_id").cast("string")))
        .orderBy("h").limit(Similarity.IvfTrainSample)
        .select(col("vec_id"), col("e"), col("norm"))
      val (centP, _) = Similarity.ivfIndex(prefix)
      def snap(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("c_id").collect()
          .map(r => (r.getInt(0), r.getSeq[Double](1).toList)).toList
      assert(snap(cent) == snap(centP),
        "sampled training must be a pure function of the md5-rank prefix")
      assert(lists.count() == 10000,
        "every corpus vector must still be assigned to a cell")
    } finally Caches.releaseScoped()
  }

  // ---------------------------------------------------------------
  // VERDICT r14 #3: incremental compaction. One quiesce point folds
  // per-bucket slices under a leaf/time budget instead of the whole
  // store; every intermediate state serves the identical logical rows
  // (including the __obatch rank), repeated quiesce points converge to
  // a fully folded store, and mid-fold admission decisions (folded-
  // history veto + fresh admit) are unchanged.
  // ---------------------------------------------------------------

  test("incremental compaction: single-slice quiesce points converge; every partial state serves identical rows; folded history still vetoes") {
    import graft.streaming.BandStore
    val root = tmpDir("r15-slice")
    val store = s"$root/store"
    val out = s"$root/admitted"
    def text(tag: String, i: Int) =
      (0 until 25).map(j => s"${tag}_w${i}_$j").mkString(" ")
    def batchDf(b: Int) = Seq(
      (b * 2L, text("a", b * 2)), (b * 2L + 1, text("a", b * 2 + 1))
    ).toDF("doc_id", "text")
    (0 until 5).foreach(b => BandStore.admitBatch(batchDf(b), b.toLong, store, out))
    def treeRows(dir: String): Set[String] =
      spark.read.parquet(dir)
        .selectExpr("concat_ws(':', band, bh, doc_id, __obatch)")
        .collect().map(_.getString(0)).toSet
    // LIVE ids (manifest view): retirement now defers physical deletion
    // by the retire grace, so raw dir listings include reaped-later
    // debris and are not the store's logical state
    def batchIds(dir: String): Seq[Long] = BandStore.liveBatchIds(spark, dir)
    val before = treeRows(BandStore.bandsDir(store))
    withConf(BandStore.CompactSliceLeavesConf -> "2",
             BandStore.CompactSliceBudgetConf -> "0.0") {
      // budget 0.0 admits exactly one slice per quiesce call (the first
      // slice always runs; any spent time then exceeds the budget)
      var n = BandStore.compactSlices(spark, store, Long.MaxValue)
      assert(n == 1, s"budget 0.0 must run exactly one slice, ran $n")
      // mid-fold: the visible rows are unchanged
      assert(treeRows(BandStore.bandsDir(store)) == before,
        "a partial fold changed the bands tree's logical rows")
      var steps = 0
      while (n > 0 && steps < 300) {
        n = BandStore.compactSlices(spark, store, Long.MaxValue)
        steps += 1
      }
      assert(steps < 300, "slice quiesce points never converged")
    }
    assert(treeRows(BandStore.bandsDir(store)) == before,
      "the converged fold changed the bands tree's logical rows")
    assert(batchIds(BandStore.bandsDir(store)).forall(_ < 0) &&
           batchIds(BandStore.sigsDir(store)).forall(_ < 0),
      "convergence must leave only base generations")
    // folded history still vetoes; fresh still admits
    BandStore.admitBatch(Seq((100L, text("a", 0)), (101L, text("b", 101)))
      .toDF("doc_id", "text"), 5L, store, out)
    val ids = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(!ids.contains(100L), "the folded base generation must still veto")
    assert(ids.contains(101L), "a fresh doc must still admit")
    // need-filter (the ×50 soak pathology): a freshly folded store
    // below the fold threshold is left ALONE — no slice may re-rewrite
    // a base just to absorb one new batch (that is O(store) per batch)
    BandStore.admitBatch(Seq((200L, text("c", 200))).toDF("doc_id", "text"),
      6L, store, out)
    val basesBefore = batchIds(BandStore.bandsDir(store)).toSet
    // a threshold above both trees' current dir counts: neither tree is
    // needy, so the call must be a complete no-op
    val over = 2 + math.max(batchIds(BandStore.bandsDir(store)).size,
      batchIds(BandStore.sigsDir(store)).size)
    val n2 = BandStore.compactSlices(spark, store, Long.MaxValue, minFoldDirs = over)
    assert(n2 == 0,
      s"a store below the fold threshold must not be touched, ran $n2 slices")
    assert(batchIds(BandStore.bandsDir(store)).toSet == basesBefore,
      "the need-filtered call must leave the tree untouched")
    // TIER pin: minor folds stack small bases (prior bases never
    // rewritten — pause cost must not grow with store size); a MAJOR
    // fold at the fan-in merges them without changing the logical rows
    var m = BandStore.compactSlices(spark, store, Long.MaxValue)
    while (m > 0) m = BandStore.compactSlices(spark, store, Long.MaxValue)
    val preMajorRows = treeRows(BandStore.bandsDir(store))
    val preMajorDirs = batchIds(BandStore.bandsDir(store))
    assert(preMajorDirs.forall(_ < 0) && preMajorDirs.size > 1,
      s"expected stacked bases before the major fold: $preMajorDirs")
    withConf(BandStore.CompactBaseFaninConf -> "2") {
      var k = BandStore.compactSlices(spark, store, Long.MaxValue)
      while (k > 0) k = BandStore.compactSlices(spark, store, Long.MaxValue)
    }
    assert(treeRows(BandStore.bandsDir(store)) == preMajorRows,
      "the major fold changed the bands tree's logical rows")
    val postMajorDirs = batchIds(BandStore.bandsDir(store))
    assert(postMajorDirs.forall(_ < 0) && postMajorDirs.size < preMajorDirs.size,
      s"major fold must reduce base count: ${preMajorDirs.size} -> ${postMajorDirs.size}")
  }
}
