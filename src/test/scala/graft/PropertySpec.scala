package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Property-based invariants (SURVEY.md §5.2.3) on small generated frames.
  * Drives ScalaCheck Gen directly with fixed seeds (the scalatestplus
  * bridge is not in the offline dependency cache) — 10 deterministic
  * samples per property.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rows = Gen.listOf(Gen.zip(Gen.chooseNum(0L, 20L), Gen.chooseNum(-100, 100)))

  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit =
    (1 to 10).foreach { i =>
      val params = Gen.Parameters.default.withSize(40)
      val sample = gen.pureApply(params, Seed(42L + i), retries = 100)
      body(sample)
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => body(t._1, t._2))

  test("R6: approx_count_distinct lands within 2x the configured rsd of the exact count") {
    val row = graft.operators.Relational.r6Approx(spark, sfDir).head()
    assert(row.getBoolean(1), s"approx drifted beyond 4% of exact=${row.getLong(0)}")
    assert(row.getLong(0) ==
      graft.operators.Relational.r6DistinctCount(spark, sfDir).head().getLong(0))
  }

  test("dedup idempotence: dropDuplicates(dropDuplicates(x)) == dropDuplicates(x)") {
    forAll(rows) { xs =>
      val df = xs.toDF("k", "v")
      val d1 = df.dropDuplicates("k")
      assert(d1.dropDuplicates("k").count() == d1.count())
    }
  }

  test("filter result is a subset of the input") {
    forAll(rows) { xs =>
      val df = xs.toDF("k", "v")
      val f = df.filter(col("v") > 0)
      assert(f.exceptAll(df).count() == 0)
      assert(f.count() <= df.count())
    }
  }

  test("union row-count conservation") {
    forAll(rows, rows) { (a, b) =>
      val (da, db) = (a.toDF("k", "v"), b.toDF("k", "v"))
      assert(da.unionByName(db).count() == a.length + b.length)
    }
  }

  test("top-k equals the k-prefix of the full sort") {
    forAll(rows, Gen.chooseNum(1, 10)) { (xs, k) =>
      val df = xs.toDF("k", "v")
      val topk = df.orderBy(col("v").desc, col("k")).limit(k).collect().toSeq
      val full = df.orderBy(col("v").desc, col("k")).collect().take(k).toSeq
      assert(topk == full)
    }
  }

  test("groupBy-sum partitions the total: sum of group sums == global sum") {
    forAll(rows) { xs =>
      val df = xs.toDF("k", "v")
      val grouped = df.groupBy("k").agg(sum("v").as("s"))
        .agg(sum("s")).collect().head
      val global = df.agg(sum("v")).collect().head
      assert(grouped.isNullAt(0) == global.isNullAt(0))
      if (!global.isNullAt(0)) assert(grouped.getLong(0) == global.getLong(0))
    }
  }

  test("native dot_f64 equals the HOF zip_with/aggregate formulation") {
    val vecs = Gen.listOfN(8, Gen.chooseNum(-10.0, 10.0).map(v => math.rint(v * 100) / 100))
    forAll(vecs, vecs) { (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val native = df.select(graft.functions.VectorFunctions.dotF64(col("a"), col("b")))
        .collect().head.getDouble(0)
      val hof = df.selectExpr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")
        .collect().head.getDouble(0)
      assert(math.abs(native - hof) < 1e-9)
    }
  }

  test("native minhash_sig: 128 values in [0,P), equal arrays give equal sigs, " +
    "containment never increases minima") {
    val shingleGen = Gen.nonEmptyListOf(Gen.identifier.map(_.take(8)))
    forAll(shingleGen) { sh =>
      val df = Seq(Tuple1(sh)).toDF("sh")
      val sig = df.select(graft.functions.MinHashSig(col("sh"))).collect().head.getSeq[Long](0)
      assert(sig.length == 128)
      assert(sig.forall(v => v >= 0L && v < 1000000007L))
      val again = df.select(graft.functions.MinHashSig(col("sh"))).collect().head.getSeq[Long](0)
      assert(sig == again)
      // superset property: adding shingles can only lower (or keep) each min
      val sup = Seq(Tuple1(sh ++ List("extra_shingle_zz"))).toDF("sh")
        .select(graft.functions.MinHashSig(col("sh"))).collect().head.getSeq[Long](0)
      assert(sig.zip(sup).forall { case (s, u) => u <= s })
    }
  }

  test("native signatures skip null array elements instead of crashing, equal to the null-free input") {
    import graft.functions.{MinHashSig, NGramHashes, SimHashSig}
    // the SQL surface casts to array<string> with containsNull=true —
    // arbitrary caller input can hold null elements
    val clean = Seq(Tuple1(Seq("alpha", "beta", "gamma", "delta"))).toDF("sh")
    val holey = Seq(Tuple1(Seq("alpha", null, "beta", "gamma", null, "delta"))).toDF("sh")
    def longs(df: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.Column): List[Long] =
      df.select(c).collect().head.getSeq[Long](0).toList
    def one(df: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.Column): Long =
      df.select(c).collect().head.getLong(0)
    assert(longs(holey, MinHashSig(col("sh"))) == longs(clean, MinHashSig(col("sh"))))
    assert(one(holey, SimHashSig(col("sh"))) == one(clean, SimHashSig(col("sh"))))
    assert(longs(holey, NGramHashes(col("sh"), 2)) == longs(clean, NGramHashes(col("sh"), 2)))
  }

  test("last-wins upsert: result has one row per key, the max-offset one") {
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0L, 1000L), Gen.chooseNum(0L, 5L)))) { xs =>
      val df = xs.toDF("offset", "id")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("id")).orderBy(col("offset").desc)
      val up = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
      val expect = xs.groupBy(_._2).view.mapValues(_.map(_._1).max).toMap
      val got = up.collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
      assert(got == expect)
    }
  }

  test("x4_repetition: doubling ANY fixture document trips the repetition gate") {
    // doc T → T ⧺ T: every trigram of T recurs in the second copy, so
    // duplicated-trigram mass ≥ 2(n−2)/(2n−1) > 1/2 for n ≥ 5 tokens —
    // far over the 0.05 gate. A corpus-wide invariant over all 500 real
    // fixture texts, not a hand-picked example.
    val dir = tmpDir("prop-rep-doubled")
    graft.engine.Tables.documents(spark, sfDir)
      .filter(size(split(col("text"), " ")) >= 5)
      .select(col("doc_id"),
        concat(col("text"), lit(" "), col("text")).as("text"),
        col("source"), col("lang"),
        (col("n_chars") * 2 + 1).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.operators.TextAnalysis.x4Repetition(spark, dir)
    assert(out.count() > 0)
    assert(out.filter(col("keep")).count() == 0,
      "a doubled document must never pass the repetition gate")
    assert(out.filter(col("dup_trigram_frac") <= 0.5).count() == 0,
      "duplicated-trigram mass of a doubled doc is provably > 1/2")
  }

  test("x4_prep_funnel: appending an exact copy of every fixture doc changes no original label; copies inherit gate labels, dup on keep") {
    // corpus-wide invariant over all real fixture texts: per-doc gates
    // see only the text (identical text ⇒ identical verdict), so a copy
    // must land on its original's gate — except a copy of a 'keep' doc,
    // which the min-id dedup stage must relabel 'exact_dup'. And no
    // copy may ever be 'keep'.
    val base = graft.operators.TextAnalysis.x4PrepFunnel(spark, sfDir)
      .select(col("doc_id"), col("stage")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val dir = tmpDir("prop-funnel-copies")
    val docs = graft.engine.Tables.documents(spark, sfDir)
    docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 1000000L))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.operators.TextAnalysis.x4PrepFunnel(spark, dir)
      .select(col("doc_id"), col("stage")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == base.size * 2)
    base.foreach { case (id, stage) =>
      assert(out(id) == stage,
        s"original doc $id relabeled: ${out(id)} != $stage")
      val expected = if (stage == "keep") "exact_dup" else stage
      assert(out(id + 1000000L) == expected,
        s"copy of $id ($stage): ${out(id + 1000000L)} != $expected")
    }
  }

  test("TopKPerGroup == window row_number form on arbitrary grouped data") {
    forAll(rows, Gen.chooseNum(1, 6)) { (xs, k) =>
      val df = xs.toDF("g", "v")
      val native = graft.plans.TopKPerGroup(df, Seq(col("g")),
          Seq(col("v").desc, col("g")), k)
        .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("g"))
      val windowed = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select(col("g"), col("v"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      assert(native == windowed)
    }
  }
}
