package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dags, IvfStore, LabelStore}

/** Round-10 additions: tombstone DELETE maintenance for both
  * materialized stores (VERDICT r9 items 1, 2) and the store-backed
  * corpus composite surviving a full append → delete → read lifecycle
  * (item 6).
  */
class Round10Spec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------
  // Label store — incremental delete
  // ---------------------------------------------------------------

  /** Synthetic corpus with two planted structures:
    *   - a CHAIN 10–11–12: 10≈11 and 11≈12 are near-dups (J ≈ 0.81)
    *     but 10 vs 12 is not (J ≈ 0.65) — deleting 11 must SPLIT the
    *     component and drop both survivors from the label table;
    *   - a TRIANGLE 20, 21, 22, mutually near-dup — deleting the REP 20
    *     must relabel {21, 22} under the new minimum 21.
    * Texts are 30 unique tokens per structure (fillers fully disjoint),
    * so no unplanned edges exist.
    */
  private def docRows(drop: Set[Long]): Seq[(Long, String)] = {
    def toks(p: String, n: Int) = (0 until n).map(i => s"${p}$i")
    val chainA = toks("ch", 30)
    val chainB = chainA.updated(28, "chx28").updated(29, "chx29")
    val chainC = chainB.updated(0, "chy0").updated(1, "chy1")
    val triBase = toks("tr", 30)
    val tri21 = triBase.updated(29, "trx29")
    val tri22 = triBase.updated(28, "try28")
    // enough fillers that the planted structures stay well under the
    // touched-mass rebuild threshold (half the corpus)
    val fillers = (100L until 120L).map(i => (i, toks(s"f${i}_", 30).mkString(" ")))
    val planted = Seq(
      10L -> chainA.mkString(" "), 11L -> chainB.mkString(" "),
      12L -> chainC.mkString(" "),
      20L -> triBase.mkString(" "), 21L -> tri21.mkString(" "),
      22L -> tri22.mkString(" "))
    (fillers ++ planted).filter { case (id, _) => !drop.contains(id) }
  }

  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("doc_id", "text")
      .withColumn("source", lit("s")).withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(2)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  private def labelSet(store: String): Set[(Long, Long)] =
    LabelStore.read(spark, store).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("X2e''': deleting a bridge doc splits its cluster; deleting a rep relabels — equal to from-scratch") {
    val dir = tmpDir("r10-label-del")
    val store = tmpDir("r10-label-delstore") + "/store"
    writeDocs(dir, docRows(Set.empty))
    LabelStore.build(spark, dir, store)
    // sanity: chain and triangle each one component under min-label
    assert(labelSet(store) == Set((10L, 10L), (11L, 10L), (12L, 10L),
      (20L, 20L), (21L, 20L), (22L, 20L)))

    writeDocs(dir, docRows(drop = Set(11L, 20L)))
    assert(LabelStore.ensureCurrentIncremental(spark, dir, store) == "incremental-delete")
    assert(LabelStore.ensureCurrentIncremental(spark, dir, store) == "noop")
    // chain split to singletons (out of the table); triangle relabeled
    assert(labelSet(store) == Set((21L, 21L), (22L, 21L)))
    // the real pin: equal to a from-scratch build on the reduced corpus
    val scratch = tmpDir("r10-label-scratch") + "/store"
    LabelStore.build(spark, dir, scratch)
    assert(labelSet(store) == labelSet(scratch))
  }

  test("X2e''': a doc re-added after deletion is an append again and rejoins its cluster") {
    val dir = tmpDir("r10-label-readd")
    val store = tmpDir("r10-label-readdstore") + "/store"
    writeDocs(dir, docRows(Set.empty))
    LabelStore.build(spark, dir, store)
    writeDocs(dir, docRows(drop = Set(11L)))
    assert(LabelStore.ensureCurrentIncremental(spark, dir, store) == "incremental-delete")
    // re-add the SAME doc: the batch-aware tombstone mask must keep the
    // new rows live (its new batch outranks the tombstone) while the old
    // dead rows stay masked — the chain re-forms exactly
    writeDocs(dir, docRows(Set.empty))
    assert(LabelStore.ensureCurrentIncremental(spark, dir, store) == "incremental")
    assert(LabelStore.ensureCurrentIncremental(spark, dir, store) == "noop")
    assert(labelSet(store) == Set((10L, 10L), (11L, 10L), (12L, 10L),
      (20L, 20L), (21L, 20L), (22L, 20L)))
  }

  test("X2e''': mixed append+delete and past-half deletes fall back to the full rebuild") {
    val dir = tmpDir("r10-label-mixed")
    val store = tmpDir("r10-label-mixedstore") + "/store"
    writeDocs(dir, docRows(Set.empty))
    LabelStore.build(spark, dir, store)
    // one doc out, one new doc in — mixed batch, full rebuild
    writeDocs(dir, docRows(drop = Set(21L)) :+ (30L -> "mx0 mx1 mx2 mx3 mx4"))
    assert(LabelStore.ensureCurrentIncremental(spark, dir, store) == "full")
    assert(LabelStore.ensureCurrentIncremental(spark, dir, store) == "noop")
    // now delete far past the compaction threshold (9 of 12 docs)
    writeDocs(dir, (docRows(drop = Set(21L)) :+ (30L -> "mx0 mx1 mx2 mx3 mx4"))
      .filter(_._1 >= 10L).take(3))
    assert(LabelStore.ensureCurrentIncremental(spark, dir, store) == "full")
    assert(LabelStore.ensureCurrentIncremental(spark, dir, store) == "noop")
  }

  // ---------------------------------------------------------------
  // IVF store — incremental delete
  // ---------------------------------------------------------------

  private def writeEmb(dir: String, vecs: Seq[(Long, Seq[Float])]): Unit =
    vecs.toDF("vec_id", "embedding").withColumn("label", lit(0)).repartition(4)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

  private def baseVecs: Seq[(Long, Seq[Float])] =
    (0 until 64).map { i =>
      (i.toLong, (0 until 64).map { j =>
        if (j == i % 16) 3.0f
        else if (j == (i * 7) % 64) 1.5f
        else 0.1f * ((i + j) % 5)
      })
    }

  test("X3c'''': successive deletes accumulate tombstones correctly; re-add revives the vector") {
    val dir = tmpDir("r10-ivf-del")
    val store = tmpDir("r10-ivf-delstore") + "/store"
    writeEmb(dir, baseVecs)
    IvfStore.build(spark, dir, store)
    writeEmb(dir, baseVecs.filterNot(_._1 == 20L))
    assert(IvfStore.ensureCurrentIncremental(spark, dir, store) == "incremental-delete")
    writeEmb(dir, baseVecs.filterNot(v => v._1 == 20L || v._1 == 21L))
    assert(IvfStore.ensureCurrentIncremental(spark, dir, store) == "incremental-delete")
    assert(IvfStore.ensureCurrentIncremental(spark, dir, store) == "noop")
    val probed = IvfStore.probe(spark, dir, store)
    assert(probed.filter(col("vec_id").isin(20L, 21L)).isEmpty,
      "tombstoned vectors must never be served")
    // re-add vector 20: an append whose new list rows outrank its
    // tombstone — served again, while 21 stays dead
    writeEmb(dir, baseVecs.filterNot(_._1 == 21L))
    assert(IvfStore.ensureCurrentIncremental(spark, dir, store) == "incremental")
    val served = IvfStore.probe(spark, dir, store)
    assert(served.filter(col("vec_id") === 21L).isEmpty)
    assert(served.groupBy("q_id").count().filter(col("count") =!= 5).count() == 0)
  }

  test("X3c'''': mixed append+delete and past-half deletes fall back to the full rebuild") {
    val dir = tmpDir("r10-ivf-mixed")
    val store = tmpDir("r10-ivf-mixedstore") + "/store"
    writeEmb(dir, baseVecs)
    IvfStore.build(spark, dir, store)
    writeEmb(dir, baseVecs.filterNot(_._1 == 7L) :+
      (100L, (0 until 64).map(j => if (j == 3) 2.0f else 0.2f)))
    assert(IvfStore.ensureCurrentIncremental(spark, dir, store) == "full")
    assert(IvfStore.ensureCurrentIncremental(spark, dir, store) == "noop")
    writeEmb(dir, baseVecs.take(8))
    assert(IvfStore.ensureCurrentIncremental(spark, dir, store) == "full")
    assert(IvfStore.ensureCurrentIncremental(spark, dir, store) == "noop")
  }

  test("X3c'''': the delete oracle row takes the delete path and serves no deleted vector") {
    val out = IvfStore.x3AnnIvfDelete(spark, sfDir)
    assert(out.columns.toSeq == Seq("q_id", "rank", "vec_id", "cosine"))
    assert(out.filter(col("vec_id") % 5 === 3 && col("vec_id") >= 10).isEmpty,
      "deleted vectors surfaced in the served top-k")
    assert(out.groupBy("q_id").count().filter(col("count") =!= 5).count() == 0)
  }

  // ---------------------------------------------------------------
  // S11 — date-partitioned store: pruning pinned in the plan
  // ---------------------------------------------------------------

  test("S11: the date-ranged scan reads exactly the requested partitions (PruneFileSourcePartitions)") {
    import graft.sources.DateStore
    val store = tmpDir("r10-datestore") + "/store"
    assert(DateStore.ensureCurrent(spark, sfDir, store), "first build must write")
    assert(!DateStore.ensureCurrent(spark, sfDir, store), "second call must be a fingerprint noop")
    val total = DateStore.readEvents(spark, store)
      .select(col("event_date")).distinct().count()
    assert(total == 30, s"fixture events span 30 days, found $total partitions")
    val scan = DateStore.rollupScan(spark, store)
    val p = scan.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PartitionFilters: ["), p.take(1500))
    val scanned = scan.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }
    assert(scanned.nonEmpty, "no file scan found")
    assert(scanned.head == 7,
      s"expected exactly the 7 requested day-partitions scanned, got ${scanned.head} of $total")
    // and no row-level date recomputation survives: the filter is fully
    // absorbed by partition pruning (nothing left in the data filters)
    assert(!p.contains("to_date"), "date filter leaked past the partition boundary")
  }

  // ---------------------------------------------------------------
  // Store-backed corpus composite across the append→delete lifecycle
  // ---------------------------------------------------------------

  test("composite lifecycle: dag_corpus_build_stored serves the maintained store across append and delete") {
    // scratch corpus dir: the sf0.001 documents table copied, so the
    // canonical store keyed by this path starts empty and the composite's
    // ensureCurrentIncremental drives the real maintenance transitions
    val dir = tmpDir("r10-lifecycle")
    val docs0 = graft.engine.Tables.documents(spark, sfDir)
    docs0.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def storeless = Dags.dagCorpusBuildFrom(spark, dir, labelStore = None)
      .collect().map(_.getLong(0)).toSet
    def stored = Dags.dagCorpusBuildStored(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(stored == storeless, "initial build")

    // APPEND: duplicate the texts of docs 3 and 4 under new ids — they
    // must join those docs' clusters and fall out of the keep set
    val dupes = docs0.filter(col("doc_id").isin(3L, 4L))
      .withColumn("doc_id", col("doc_id") + 100000L)
    docs0.unionByName(dupes).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(stored == storeless, "after append")

    // DELETE: drop the duplicates and a slice of originals — the stored
    // composite must serve the reduced corpus via the tombstone path
    docs0.filter(col("doc_id") % 9 =!= 5)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(stored == storeless, "after delete")
  }
}
