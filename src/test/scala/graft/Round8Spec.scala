package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dags, Dedup, LabelStore}

/** Round-8 pins: adaptive cluster-edge partitioning (the r7 `weak`),
  * the sizing law extended to the text-LSH constants, the materialized
  * label store, and the empty-fixture invariant behind the ≥0.9
  * embedding oracle twin.
  */
class Round8Spec extends SparkSpec {

  // ---------------------------------------------------------------
  // X2e — edge partitioning derived from the measured edge count
  // ---------------------------------------------------------------

  test("X2e: edgePartitions follows the measured-volume law (floor, linear, ceiling)") {
    // floor: fixture-scale graphs collapse to a handful of tasks
    assert(Dedup.edgePartitions(0L) == 4)
    assert(Dedup.edgePartitions(3999999L) == 4)
    // linear region: partitions track edges/perPartition
    assert(Dedup.edgePartitions(10000000L) == 10)
    assert(Dedup.edgePartitions(10000001L) == 11)
    // perPartition parameter respected (the conf knob's plumbing)
    assert(Dedup.edgePartitions(100L, 10L) == 10)
    // ceiling: backstop, not a tuning constant
    assert(Dedup.edgePartitions(Long.MaxValue / 4) == 65536)
  }

  test("X2e: clusterPairs labels are invariant under the partitioning the edge count picks") {
    import spark.implicits._
    // a 64-node chain (worst diameter) plus an 8-clique — 71 + 28 edges
    val pairs = ((0L until 63L).map(i => (i, i + 1)) ++
      (for { a <- 100L until 108L; b <- (a + 1) until 108L } yield (a, b)))
      .toDF("doc_a", "doc_b")
    // this test pins the DISTRIBUTED fixpoint's partitioning invariance —
    // keep the measured-small graph off the driver union-find fast path
    spark.conf.set(Dedup.DriverMaxEdgesConf, "0")
    val (labelsDefault, roundsDefault) = Dedup.clusterPairs(pairs)
    val expect = labelsDefault.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // force the scaled path: 8 edges/partition puts the doubled edge set
    // (182 rows) at 23 partitions — the repartition branch, not the
    // fixture coalesce — and the fixpoint must not notice
    spark.conf.set(Dedup.EdgesPerPartitionConf, "8")
    try {
      val (labelsScaled, roundsScaled) = Dedup.clusterPairs(pairs)
      val got = labelsScaled.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == expect)
      assert(roundsScaled <= 10 && roundsDefault <= 10,
        s"pointer doubling must stay logarithmic: $roundsDefault / $roundsScaled")
      // every chain node labels to 0; every clique node to 100
      assert((0L until 64L).forall(expect(_) == 0L))
      assert((100L until 108L).forall(expect(_) == 100L))
    } finally {
      spark.conf.unset(Dedup.EdgesPerPartitionConf)
      spark.conf.unset(Dedup.DriverMaxEdgesConf)
    }
  }

  // ---------------------------------------------------------------
  // X2b — MinHash banding + bucket cap from the sizing law
  // ---------------------------------------------------------------

  test("X2b: the 32x4 banding is the recall law's output, and the law holds off-default") {
    assert(Dedup.minhashGeometry() == (32, 4),
      "defaults must reproduce the shipped geometry")
    // the generated expression is byte-identical to the banding every
    // existing band store was written with — a format compatibility pin
    assert(Dedup.bandSql ==
      "transform(sequence(0, 31), b -> xxhash64(concat_ws(',', slice(sig, b * 4 + 1, 4))))")
    // law properties at other operating points (assert the law, not
    // constants): fits the budget, meets the recall bound, and rows are
    // maximal — one more row per band would blow the permutation budget
    for ((t, miss, perms) <- Seq((0.8, 5e-8, 128), (0.8, 1e-3, 128),
                                 (0.9, 5e-8, 128), (0.8, 5e-8, 256), (0.7, 1e-6, 64))) {
      val (bands, rows) = Dedup.minhashGeometry(t, miss, perms)
      assert(bands * rows <= perms, s"($t,$miss,$perms) -> $bands x $rows over budget")
      assert(math.pow(1.0 - math.pow(t, rows), bands) <= miss * (1 + 1e-9),
        s"($t,$miss,$perms) -> $bands x $rows misses the recall bound")
      if (rows < perms) {
        val up = rows + 1
        val needed = math.ceil(math.log(miss) / math.log1p(-math.pow(t, up))).toInt
        assert(needed * up > perms,
          s"($t,$miss,$perms): $up rows would still fit — law not maximal")
      }
    }
  }

  test("X2: bucket cap derives from the measured corpus size; conf override wins") {
    // floor protects fixture-scale buckets from the star path
    assert(Dedup.derivedBucketCap(500L) == 256)
    // sqrt(2n) region: a cap-full bucket costs ~n pairs, one linear unit
    val mid = Dedup.derivedBucketCap(1000000L)
    assert(math.abs(mid - math.sqrt(2e6)) <= 1, s"mid-region cap $mid")
    // ceiling bounds the single-bucket verification burst
    assert(Dedup.derivedBucketCap(1000000000L) == 8192)
    assert(Dedup.bucketCap(spark, 1000000L) == mid)
    spark.conf.set(Dedup.BucketCapConf, "7")
    try assert(Dedup.bucketCap(spark, 1000000L) == 7)
    finally spark.conf.unset(Dedup.BucketCapConf)
  }

  // ---------------------------------------------------------------
  // Label store — build once, read everywhere
  // ---------------------------------------------------------------

  /** Corpus with real cluster structure: exact-dup group {0,1,2},
    * near-dup pair {10,11} (3-shingle Jaccard 9/11 ≈ 0.82), distinct
    * tails elsewhere.
    */
  private def writeClusteredCorpus(dir: String, extraDoc: Option[Long] = None): Unit = {
    import spark.implicits._
    val base = (0 until 12).map(j => s"tok$j").mkString(" ")
    def distinctText(i: Long) = (0 until 12).map(j => s"d${i}w$j").mkString(" ")
    val rows: Seq[(Long, String)] =
      Seq(0L -> base, 1L -> base, 2L -> base,
          10L -> ((0 until 11).map(j => s"n$j").mkString(" ") + " tailA"),
          11L -> ((0 until 11).map(j => s"n$j").mkString(" ") + " tailB")) ++
        (20L until 30L).map(i => i -> distinctText(i)) ++
        extraDoc.map(i => i -> distinctText(i)).toSeq
    rows.toDF("doc_id", "text")
      .withColumn("source", lit("s")).withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(3)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("LabelStore: publish/read/keepSet match the direct pipeline; rebuild fires on append only") {
    val dir = tmpDir("r8-labelcorpus")
    val store = tmpDir("r8-labelstore") + "/store"
    writeClusteredCorpus(dir)

    LabelStore.build(spark, dir, store)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val direct = asMap(Dedup.x2DupClusters(spark, dir))
    assert(direct.nonEmpty && direct(1L) == 0L && direct(11L) == 10L,
      s"planted clusters missing: $direct")
    assert(asMap(LabelStore.read(spark, store)) == direct,
      "store read must equal the direct pipeline")

    // keep-set through the store == keep-set through the pipeline
    val keepDirect = Dedup.x2DedupKeep(spark, dir).collect().map(_.getLong(0)).toSeq
    val keepStore = LabelStore.keepSet(spark, dir, store).collect().map(_.getLong(0)).toSeq
    assert(keepStore == keepDirect)
    assert(!keepStore.contains(1L) && !keepStore.contains(11L) && keepStore.contains(10L))

    // current corpus: no rebuild; appended corpus: rebuild, labels refresh
    assert(!LabelStore.ensureCurrent(spark, dir, store), "unchanged corpus must not rebuild")
    writeClusteredCorpus(dir, extraDoc = Some(30L))
    assert(LabelStore.ensureCurrent(spark, dir, store), "appended corpus must rebuild")
    assert(asMap(LabelStore.read(spark, store)) == asMap(Dedup.x2DupClusters(spark, dir)))
    assert(!LabelStore.ensureCurrent(spark, dir, store), "fresh rebuild must be current")

    // generation hygiene: after N rebuilds only the newest two are live
    writeClusteredCorpus(dir, extraDoc = Some(31L))
    assert(LabelStore.ensureCurrent(spark, dir, store))
    val live = new java.io.File(store).listFiles().map(_.getName)
      .filter(_.startsWith("gen=")).sorted
    assert(live.length == 2, s"expected the newest two generations live, got ${live.toSeq}")
  }

  test("dag_corpus_build through the label store equals the storeless composite") {
    val dir = tmpDir("r8-dagcorpus")
    val store = tmpDir("r8-dagstore") + "/store"
    writeClusteredCorpus(dir)
    LabelStore.build(spark, dir, store)
    val direct = Dags.dagCorpusBuild(spark, dir).collect().toSeq
    val stored = Dags.dagCorpusBuildFrom(spark, dir, Some(store)).collect().toSeq
    assert(stored == direct)
  }

  // ---------------------------------------------------------------
  // X2e'' — incremental label maintenance (append without rebuild)
  // ---------------------------------------------------------------

  /** Corpus for the incremental tests. Base (stage 0): exact group
    * {0,1,2}; near pair {10,11} (J=9/11); two sub-threshold-adjacent
    * clusters C1={20,21} and C2={22,23} (every cross pair < 0.8);
    * distinct fillers 40–49. Stage 1 appends: 30 near-dup of the
    * NON-rep 11 only (J(30,11)=9/11, J(30,10)=8/12), 32 bridging C1
    * and C2 (J=9/11 with 20, 9/11 with 22), 33 an exact copy of doc
    * 0's text, the fresh pair {34,35}, and the loner 36. Stage 2
    * appends 37, a near-dup of the previously-appended 36. `mutate`
    * rewrites doc 40's text in place (a non-append change).
    */
  private def writeIncCorpus(dir: String, stage: Int, mutate: Boolean = false): Unit = {
    import spark.implicits._
    def toks(p: String, from: Int, to: Int) = (from to to).map(i => s"$p$i").mkString(" ")
    val base: Seq[(Long, String)] = Seq(
      0L -> toks("tok", 0, 11), 1L -> toks("tok", 0, 11), 2L -> toks("tok", 0, 11),
      10L -> (toks("n", 0, 10) + " tailA"), 11L -> (toks("n", 0, 10) + " tailB"),
      20L -> toks("m", 0, 11), 21L -> (toks("m", 0, 10) + " q"),
      22L -> toks("m", 2, 13), 23L -> toks("m", 2, 12)) ++
      (40L until 50L).map(i => i -> (0 until 12).map(j => s"d${i}w$j").mkString(" "))
    val app1: Seq[(Long, String)] = Seq(
      30L -> ("x0 " + toks("n", 1, 10) + " tailB"),
      32L -> toks("m", 1, 12),
      33L -> toks("tok", 0, 11),
      34L -> toks("p", 0, 11), 35L -> (toks("p", 0, 10) + " r"),
      36L -> toks("z", 0, 11))
    val app2: Seq[(Long, String)] = Seq(37L -> (toks("z", 0, 10) + " y"))
    val rows = (base ++ (if (stage >= 1) app1 else Nil) ++ (if (stage >= 2) app2 else Nil))
      .map { case (id, t) => if (mutate && id == 40L) (id, t + " mutated") else (id, t) }
    rows.toDF("doc_id", "text")
      .withColumn("source", lit("s")).withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(3)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private def labelMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("X2e'': incremental append equals the full rebuild — non-rep attach, bridge merge, exact dup, fresh pair") {
    val dir = tmpDir("r8-inccorpus")
    val store = tmpDir("r8-incstore") + "/store"
    writeIncCorpus(dir, stage = 0)
    LabelStore.build(spark, dir, store)
    // sanity on the planted base structure
    val base = labelMap(LabelStore.read(spark, store))
    assert(base(23L) == 22L && base(21L) == 20L && base(20L) == 20L,
      s"planted base clusters malformed: $base")

    writeIncCorpus(dir, stage = 1)
    assert(LabelStore.ensureCurrentIncremental(spark, dir, store) == "incremental")
    val got = labelMap(LabelStore.read(spark, store))
    val full = labelMap(Dedup.x2DupClusters(spark, dir))
    assert(got == full, s"incremental diverged from full rebuild:\n$got\nvs\n$full")
    // the shapes that MUST work and that the admission store cannot serve:
    assert(got(30L) == 10L, "attach via a NON-rep cluster member")
    assert(got(32L) == 20L && got(22L) == 20L && got(23L) == 20L,
      "bridge doc must merge C1 and C2 and REMAP C2's old labels")
    assert(got(33L) == 0L, "exact-dup append joins the exact group")
    assert(got(35L) == 34L, "fresh appended pair clusters on its own")
    assert(!got.contains(36L) && !got.contains(40L), "pairless docs carry no label")

    // unchanged corpus: noop, no generation churn
    val gensBefore = new java.io.File(store).listFiles().count(_.getName.startsWith("gen="))
    assert(LabelStore.ensureCurrentIncremental(spark, dir, store) == "noop")
    assert(new java.io.File(store).listFiles().count(_.getName.startsWith("gen=")) == gensBefore)
  }

  test("X2e'': a lost index batch self-heals on the next append; mutation falls back to full") {
    val dir = tmpDir("r8-incheal")
    val store = tmpDir("r8-inchealstore") + "/store"
    writeIncCorpus(dir, stage = 0)
    LabelStore.build(spark, dir, store)
    writeIncCorpus(dir, stage = 1)
    assert(LabelStore.ensureCurrentIncremental(spark, dir, store) == "incremental")
    // simulate the crash window: labels generation 2 published, index
    // append lost — every stage-1 doc is missing from the index
    for (sub <- Seq("digests", "sigs", "bands")) {
      val batches = new java.io.File(s"$store/index/$sub").listFiles()
        .filter(_.getName.startsWith("__batch="))
      val newest = batches.maxBy(_.getName.stripPrefix("__batch=").toLong)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(newest)
    }
    // next append re-detects the lost docs as part of its delta and the
    // re-merge is idempotent: contracted endpoints of already-labeled
    // docs collapse to their reps, so replayed edges change nothing
    writeIncCorpus(dir, stage = 2)
    assert(LabelStore.ensureCurrentIncremental(spark, dir, store) == "incremental")
    val got = labelMap(LabelStore.read(spark, store))
    assert(got == labelMap(Dedup.x2DupClusters(spark, dir)),
      "self-healed append diverged from the full rebuild")
    assert(got(37L) == 36L, "the new pair over a previously-appended doc")

    // a mutated doc is NOT an append: the path must fall back to the
    // full pipeline (and the rebuilt store must still be right)
    writeIncCorpus(dir, stage = 2, mutate = true)
    assert(LabelStore.ensureCurrentIncremental(spark, dir, store) == "full")
    assert(labelMap(LabelStore.read(spark, store)) == labelMap(Dedup.x2DupClusters(spark, dir)))
    assert(LabelStore.ensureCurrentIncremental(spark, dir, store) == "noop")
  }

  // ---------------------------------------------------------------
  // X3c' — materialized IVF index store
  // ---------------------------------------------------------------

  test("X3c': the store-served probe equals the self-contained IVF query bit-for-bit") {
    val store = tmpDir("r8-ivfstore") + "/store"
    graft.operators.IvfStore.build(spark, sfDir, store)
    val direct = graft.operators.Similarity.x3AnnIvf(spark, sfDir).collect().toSeq
    val served = graft.operators.IvfStore.probe(spark, sfDir, store).collect().toSeq
    assert(served == direct, "store round trip changed the ANN answer")
    // validity by measurement: same corpus → no rebuild; the unit
    // contract matching LabelStore's
    assert(!graft.operators.IvfStore.ensureCurrent(spark, sfDir, store))
  }

  test("X3c': the probe's lists scan is partition-pruned to the probed cells") {
    val store = tmpDir("r8-ivfprune") + "/store"
    graft.operators.IvfStore.build(spark, sfDir, store)
    // one query probes exactly IvfNProbe of the IvfNList cells — the
    // pruned count is deterministic (the 10-query oracle surface can
    // legitimately touch every cell on uniform fixtures)
    val (_, lists) = graft.operators.IvfStore.probeInputs(spark, sfDir, store, maxQueryId = 1L)
    val p = lists.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PartitionFilters: ["), p.take(1500))
    val scanned = lists.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }
    assert(scanned.nonEmpty, "no lists scan found")
    assert(scanned.head == graft.operators.Similarity.IvfNProbe,
      s"expected exactly ${graft.operators.Similarity.IvfNProbe} cells scanned, got ${scanned.head}")
  }

  // ---------------------------------------------------------------
  // ADVICE r7 — the ≥0.9 embedding twin's empty-fixture invariant
  // ---------------------------------------------------------------

  test("X2d'': the exact >=0.9 answer on the shipped fixtures is EMPTY (the auto twin's precondition)") {
    // x2EmbeddingLshAuto's oracle is the exact quadratic >=0.9 twin; the
    // twins agree on the fixtures because the true answer is empty (max
    // pairwise cosine ~0.51). If a fixture refresh ever plants genuine
    // >=0.9 pairs this fails with a clear message instead of an opaque
    // oracle hash diff (the LSH recall floor is 0.999, not 1).
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val e = graft.engine.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        .withColumn("norm", sqrt(graft.functions.VectorFunctions.dotF64(col("e"), col("e"))))
      val n = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .withColumn("cosine",
          graft.functions.VectorFunctions.dotF64(col("a.e"), col("b.e")) /
            (col("a.norm") * col("b.norm")))
        .filter(col("cosine") >= 0.9).count()
      assert(n == 0L,
        s"$dir now holds $n genuine cosine>=0.9 pairs — x2_embedding_lsh_auto's " +
          "exact-equality oracle needs the empty-answer regime; re-derive the twin")
    }
  }

  // ---------------------------------------------------------------
  // X2d' — native banding expression + the LSH-vs-brute crossover
  // ---------------------------------------------------------------

  test("X2d': native hyperplane banding equals the composed form at small and derived geometry") {
    // the native compiled loop must reproduce the Column-composed
    // formulation bit-for-bit on real fixture vectors — at the ANN probe
    // geometry (6x3) and at a corpus-derived one (25x9, the scale whose
    // composed form flirts with janino's 64 KB method limit)
    val e = graft.engine.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    for ((b, p) <- Seq((6, 3), (25, 9))) {
      val native = e.withColumn("bands",
          graft.functions.VectorFunctions.hyperplaneBands(col("e"), b, p))
        .select(col("vec_id"), col("bands")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val composed = e.withColumn("bands", graft.operators.Similarity.bandedSigComposed(b, p))
        .select(col("vec_id"), col("bands")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(native == composed, s"geometry ${b}x$p: native != composed")
      assert(native.values.flatten.toSet.size > 1, s"geometry ${b}x$p: degenerate bands")
    }
  }

  test("X2d: the crossover law takes brute where banding cannot prune, LSH where it can") {
    // threshold 0.5: at EVERY geometry the law derives for the fixture
    // corpus sizes, >= 40% of unrelated pairs survive banding — the
    // analytic statement of "LSH cannot prune below brute force at
    // cosine 0.5" — so the exact arm must win
    for (n <- Seq(500L, 2000L, 20000L)) {
      val (b, p) = Dedup.embeddingGeometry(n, threshold = 0.5)
      assert(Dedup.lshFarFraction(b, p) > 0.4, s"n=$n geometry ${b}x$p")
      assert(!Dedup.lshBeatsBrute(b, p), s"n=$n must take the exact arm at t=0.5")
    }
    // threshold 0.9: coarse small-n geometries still fail the 5x pruning
    // bar (brute is trivially cheap there anyway); from ~10k vectors the
    // law's own geometry prunes 20x+ and the banded arm engages
    val (b9s, p9s) = Dedup.embeddingGeometry(500L)
    assert(!Dedup.lshBeatsBrute(b9s, p9s), "n=500 t=0.9 stays exact")
    for (n <- Seq(20000L, 2000000L)) {
      val (b9, p9) = Dedup.embeddingGeometry(n)
      assert(Dedup.lshBeatsBrute(b9, p9), s"n=$n t=0.9 must take the banded arm")
      assert(Dedup.lshFarFraction(b9, p9) <= 0.05, s"n=$n far fraction")
    }
  }

  test("X2d: the brute arm handles identical-vector pileups through the collapse") {
    import spark.implicits._
    // 30 near-orthogonal vectors, one replicated 5x (byte-identical) and
    // one planted twin pair — the collapse branch of the shared pair
    // pipeline on the EXACT arm, checked against the quadratic answer
    val base = (0 until 30).map { i =>
      (0 until 64).map(j => if (j == i % 16) 3.0f else if (j == 40 + i % 8) 1.0f else 0.0f)
    }
    val dups = (0 until 5).map(k => (100L + k, base(7)))
    val twin = Seq((200L, base(3).map(v => v * 1.01f): Seq[Float]))
    val vecs: Seq[(Long, Seq[Float])] =
      base.zipWithIndex.map { case (v, i) => (i.toLong, v: Seq[Float]) } ++
        dups.map { case (id, v) => (id, v: Seq[Float]) } ++ twin
    val dir = tmpDir("r8-brute-dups")
    vecs.toDF("vec_id", "embedding").withColumn("label", lit(0)).repartition(4)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val brute = Dedup.x2EmbeddingBruteAt(spark, dir, 0.9).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("norm", sqrt(graft.functions.VectorFunctions.dotF64(col("e"), col("e"))))
    val exact = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cosine", round(
        graft.functions.VectorFunctions.dotF64(col("a.e"), col("b.e")) /
          (col("a.norm") * col("b.norm")), 6))
      .filter(col("cosine") >= 0.9)
      .select(col("a.vec_id"), col("b.vec_id"), col("cosine")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // the 6-copy group alone contributes C(6,2)=15 within-group pairs
    assert(exact.size >= 16, s"fixture shape changed: ${exact.size}")
    assert(brute == exact,
      s"missing=${(exact.keySet -- brute.keySet).take(5)} extra=${(brute.keySet -- exact.keySet).take(5)}")
  }
}
