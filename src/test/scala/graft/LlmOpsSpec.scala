package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

/** [EXT] LLM-pipeline operator semantics (SURVEY.md §2.7). */
class LlmOpsSpec extends SparkSpec {
  import spark.implicits._

  test("X2: MinHash+LSH finds exactly the pairs the exact Jaccard query finds") {
    val exact = Dedup.x2Jaccard(spark, sfDir).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.x2MinHashLsh(spark, sfDir).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain near-duplicates")
    assert(lsh == exact)
  }

  test("X2: dup clusters merge transitive pairs to one representative") {
    import spark.implicits._
    // A-B and B-C near-dups: one cluster {1,2,3} labeled 1, plus {7,8}
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("doc_a", "doc_b")
    val edges = pairs.unionByName(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    var labels = edges.select(col("doc_a").as("doc")).distinct()
      .withColumn("label", col("doc"))
    for (_ <- 1 to 4) {
      val viaNeighbor = edges.join(labels, edges("doc_b") === labels("doc"))
        .select(edges("doc_a").as("doc"), col("label"))
      labels = labels.unionByName(viaNeighbor)
        .groupBy(col("doc")).agg(min(col("label")).as("label"))
    }
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
    // and the fixture query agrees with the pair set: every doc in a pair
    // gets a label, and pair endpoints always share a cluster
    val clusters = Dedup.x2DupClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Dedup.x2Jaccard(spark, sfDir).collect().foreach { r =>
      assert(clusters(r.getLong(0)) == clusters(r.getLong(1)))
    }
  }

  test("X2: native SimHash equals the HOF formulation on every fixture document") {
    val both = graft.engine.Tables.documents(spark, sfDir)
      .select(col("doc_id"), Dedup.simhashSig.as("native"), Dedup.simhashSigHof.as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(both.count() == 0, "native SimHash diverged from the HOF twin")
  }

  test("X2: SimHash flags identical and 1-token-edit docs, not unrelated ones") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // identical
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"), // 1 edit
      (4L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val sig = docs.select(col("doc_id"), Dedup.simhashSig.as("sig")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(2L))
    val editDist = java.lang.Long.bitCount(sig(1L) ^ sig(3L))
    val unrelatedDist = java.lang.Long.bitCount(sig(1L) ^ sig(4L))
    assert(editDist < unrelatedDist,
      s"1-token edit ($editDist bits) should be closer than unrelated ($unrelatedDist bits)")
  }

  test("X3: ANN results are a subset of the brute-force scores with identical cosines") {
    val brute = Similarity.x3CosineTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val ann = Similarity.x3AnnLsh(spark, sfDir).collect()
    assert(ann.nonEmpty, "LSH buckets should contain some neighbors")
    // per-query at most 5, ranks contiguous from 1
    val byQ = ann.groupBy(_.getLong(0))
    byQ.foreach { case (_, rows) =>
      assert(rows.length <= 5)
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length))
    }
    // any (q, v) pair also present in brute-force top-5 must carry the same cosine
    ann.foreach { r =>
      brute.get((r.getLong(0), r.getLong(2))).foreach { c =>
        assert(math.abs(c - r.getDouble(3)) < 1e-9)
      }
    }
  }

  test("X2: banded embedding LSH equals the exact pairs at a scale where pairs exist") {
    // sf0.001 has no pair above the 0.5 cosine threshold, so the subset
    // assertion alone would pass vacuously — run at sf0.01, where the
    // exact twin finds qualifying pairs, and require full equality
    // (recall 1 on the fixture: deterministic planes, exact verification).
    val dir = "/root/testdata/sf0.01"
    val exact = Dedup.x2EmbeddingNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Dedup.x2EmbeddingLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exact.nonEmpty, "fixture should contain at least one qualifying pair")
    assert(lsh.nonEmpty, "banded LSH must find the qualifying pair(s) — recall 0 is a bug")
    assert(lsh.keySet == exact.keySet)
    lsh.foreach { case (k, c) => assert(math.abs(exact(k) - c) < 1e-9) }
  }

  test("X2: banded embedding LSH holds >=0.9 recall at sf0.1 (subset + near-complete)") {
    val dir = "/root/testdata/sf0.1"
    val exact = Dedup.x2EmbeddingNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.x2EmbeddingLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size >= 10, s"expected a meaningful pair population, got ${exact.size}")
    assert(lsh.subsetOf(exact), "verification must keep LSH a subset of exact")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.9, s"banded LSH recall $recall (${lsh.size}/${exact.size}) below 0.9")
  }

  test("X3: banded-LSH ANN recall@5 clears the pinned floor at both fixture scales") {
    for (dir <- Seq(sfDir, "/root/testdata/sf0.01")) {
      val rows = Similarity.x3AnnRecall(spark, dir).collect()
      assert(rows.length == 10, s"one recall row per query in $dir")
      val avg = rows.map(_.getAs[Double]("recall_at_5")).sum / rows.length
      assert(avg >= 0.6, s"avg recall@5 $avg below 0.6 floor in $dir")
    }
  }

  test("X3: IVF recall@5 clears the pinned floor at both fixture scales") {
    for (dir <- Seq(sfDir, "/root/testdata/sf0.01")) {
      val exact = Similarity.x3CosineTopK(spark, dir).select("q_id", "vec_id")
      val ivf = Similarity.x3AnnIvf(spark, dir)
        .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
      val recall = exact.join(ivf, Seq("q_id", "vec_id"), "left")
        .agg((sum(coalesce(col("hit"), lit(0))) / count(lit(1))).as("r"))
        .head().getDouble(0)
      // 32 lists / 20 probed: measured 0.90 / 0.96 / 0.96 at
      // sf0.001/0.01/0.1 (deterministic pipeline — the DuckDB twin
      // reproduces the sweep exactly; see the nprobe sweep note in
      // Similarity.x3AnnIvf)
      assert(recall >= 0.85, s"IVF recall@5 $recall below 0.85 floor in $dir")
    }
  }

  test("X3: IVF probe results carry exact cosines and contiguous ranks") {
    val brute = Similarity.x3CosineTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val ivf = Similarity.x3AnnIvf(spark, sfDir).collect()
    assert(ivf.nonEmpty, "IVF cells should contain neighbors for some query")
    val byQ = ivf.groupBy(_.getLong(0))
    byQ.foreach { case (_, rows) =>
      assert(rows.length <= 5)
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length))
    }
    // any (q, v) also in brute-force top-5 must carry the identical cosine
    ivf.foreach { r =>
      brute.get((r.getLong(0), r.getLong(2))).foreach { c =>
        assert(math.abs(c - r.getDouble(3)) < 1e-9)
      }
    }
  }

  test("X5: frame sample emits sha256 per strided frame, matching a hand slice") {
    val doc0 = graft.engine.Tables.documents(spark, sfDir)
      .filter(col("doc_id") === 0).collect().head.getAs[String]("text")
    val bytes = doc0.getBytes("UTF-8")
    val expectFrames = (bytes.length - 1) / 256 + 1
    val rows = Multimodal.x5FrameSample(spark, sfDir)
      .filter(col("doc_id") === 0).orderBy("sample_no").collect()
    assert(rows.length == expectFrames)
    val frame0 = bytes.slice(0, math.min(64, bytes.length))
    val sha = java.security.MessageDigest.getInstance("SHA-256").digest(frame0)
      .map("%02x".format(_)).mkString
    assert(rows.head.getAs[String]("frame_sha") == sha)
  }

  test("X5: resize stub halves dimensions and strides bytes exactly") {
    val doc0 = graft.engine.Tables.documents(spark, sfDir)
      .filter(col("doc_id") === 0).collect().head.getAs[String]("text")
    val bytes = doc0.getBytes("UTF-8")
    val h = (bytes.length + 63) / 64
    val expectedLen = math.min(math.max(1, 32) * math.max(1, h / 2) * 1, (bytes.length + 3) / 4)
    val row = Multimodal.x5Resize(spark, sfDir)
      .filter(col("doc_id") === 0).collect().head
    assert(row.getInt(1) == expectedLen)
    assert(row.getInt(2) == 32 && row.getInt(3) == math.max(1, h / 2))
  }

  test("T: flatMapGroupsWithState sessionize emits closed sessions only") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val dir = tmpDir("sess")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/p.json"),
      Seq(1, 2, 3, 10, 11, 30).map(i =>
        s"""{"event_id":$i,"user_id":1,"event_type":"c","value":1.0,"k":1}""").mkString("\n"))
    val stream = graft.streaming.Streams.subscribe(spark, dir)
    val out = graft.streaming.Streams.sessionize(spark, stream, gapEvents = 5L)
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val sessions = spark.sql("SELECT * FROM sess ORDER BY session_start").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // one batch: sessions [1..3], [10..11] close; [30..] stays open in state
    assert(sessions == Seq((1L, 3L, 3L), (10L, 11L, 2L)))
  }

  test("T: sessionize never regresses the open session's end on a cross-batch straggler") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val dir = tmpDir("sess-straggler")
    val ck = tmpDir("sess-straggler-ck")
    def write(name: String, eids: Seq[Long]): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/$name"),
        eids.map(i =>
          s"""{"event_id":$i,"user_id":1,"event_type":"c","value":1.0,"k":1}""")
          .mkString("\n"))
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    def drain(): Unit = {
      // foreachBatch, not the memory sink: this drain must RESUME the
      // checkpoint across the two runs, which the memory sink refuses
      val q = graft.streaming.Streams.sessionize(spark,
          graft.streaming.Streams.subscribe(spark, dir), gapEvents = 50L)
        .writeStream
        .outputMode(OutputMode.Append()).option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
          emitted.synchronized { emitted ++= rows }
          ()
        }
        .start()
      assert(q.awaitTermination(120000), "sessionize drain did not finish")
    }
    write("p1.json", Seq(100L, 150L, 200L)) // one open session (100..200) in state
    drain()
    // 160 arrives AFTER the state already holds end=200 (file sources give
    // no cross-file ordering). A regressed end would make 211 look >gap
    // away and falsely split; the widened bounds keep it one session
    write("p2.json", Seq(160L, 211L, 300L))
    drain()
    val sessions = emitted.synchronized(emitted.toSeq)
    assert(sessions == Seq((100L, 211L, 5L)),
      s"straggler must merge without moving the end backward, got $sessions")
  }

  test("X4: fingerprint is deterministic and collision-free on the fixture") {
    val fp = TextAnalysis.x4Fingerprint(spark, sfDir)
    val n = fp.count()
    assert(fp.select("fingerprint").distinct().count() == n) // 500 distinct texts
    val again = TextAnalysis.x4Fingerprint(spark, sfDir)
    assert(fp.exceptAll(again).count() == 0)
  }

  test("X4: lang-id emits a prediction for every doc from the marker set") {
    val out = TextAnalysis.x4LangId(spark, sfDir)
    assert(out.count() == 500)
    val langs = out.select("pred_lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de", "fr", "es", "zh")))
  }

  test("X5: media feature stub matches hand-computed bytes") {
    val out = Multimodal.x5MediaFeatures(spark, sfDir)
      .filter(col("doc_id") === 0).collect().head
    val text = graft.engine.Tables.documents(spark, sfDir)
      .filter(col("doc_id") === 0).collect().head.getAs[String]("text")
    val bytes = text.getBytes("UTF-8")
    assert(out.getInt(1) == bytes.length)
    assert(out.getInt(2) == bytes.length / 64 + 1)
    assert(out.getLong(3) == bytes.take(16).map(_ & 0xff).sum.toLong)
  }

  test("X1: dedup is idempotent — dedup(dedup(x)) == dedup(x)") {
    val d1 = Dedup.x1Exact(spark, sfDir)
    // second pass over the keepers: every keeper is its own group
    assert(d1.count() == d1.select("keeper_id").distinct().count())
  }
}
