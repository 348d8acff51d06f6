package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

/** Round-11 additions: the derived partsupp view closing the last
  * TPC-H capability hole (VERDICT r10 item 1), plan pins for the
  * single-scan forms of Q2/Q20, and a regression for the stale
  * staging-dir publish bug (ADVICE r10 medium).
  */
class Round11Spec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------
  // Derived partsupp — view invariants
  // ---------------------------------------------------------------

  test("partsupp view: exactly four distinct suppliers per part, keys in range, portable arithmetic") {
    val ps = graft.operators.Analytics.partsupp(spark, sfDir)
    val nParts = graft.engine.Tables.part(spark, sfDir).count()
    val nSupp = graft.engine.Tables.supplier(spark, sfDir).count()
    assert(ps.count() == 4 * nParts, "four rows per part")
    assert(ps.select(col("ps_partkey"), col("ps_suppkey")).distinct().count()
      == 4 * nParts, "(part, supplier) pairs must be unique — stride S/4 is distinct mod S")
    val r = ps.agg(
      min(col("ps_suppkey")), max(col("ps_suppkey")),
      min(col("ps_availqty")), max(col("ps_availqty")),
      min(col("ps_supplycost")), max(col("ps_supplycost"))).head
    assert(r.getLong(0) >= 0 && r.getLong(1) < nSupp, "suppkey within supplier key space")
    assert(r.getInt(2) >= 1 && r.getInt(3) <= 9999, "availqty in [1, 9999]")
    assert(r.getDouble(4) >= 1.0 && r.getDouble(5) < 101.0, "supplycost in [1, 101)")
    // every cost is an exact multiple of 1/64 — the binary-fraction
    // portability contract with the DuckDB twin
    assert(ps.filter(col("ps_supplycost") * 64.0 =!=
      (col("ps_supplycost") * 64.0).cast("long").cast("double")).count() == 0)
  }

  // ---------------------------------------------------------------
  // Q2 / Q20 — single-scan plan pins
  // ---------------------------------------------------------------

  test("Q2 plans the correlated min as ONE keyed window over one region-qualified join — no partsupp rescan") {
    val p = graft.operators.Analytics.q2MinCostSupplier(spark, sfDir)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct"), "no cartesian product")
    assert("\\(\\d+\\) Window".r.findAllIn(p).size == 1,
      "exactly one Window node — the correlated min is the keyed window")
    // the classic form scans the partsupp domain twice (outer + the
    // correlated min); the window form derives partsupp ONCE: its one
    // generator (explode over part) plus the filtered part dim = exactly
    // two part scans in the whole plan
    assert("part\\.parquet".r.findAllIn(p).size == 2,
      "partsupp derived once + the part dim — the correlated min adds no rescan")
  }

  test("Q20 plans the nested correlated SUM as ONE lineitem aggregate — the fact is scanned once") {
    val p = graft.operators.Analytics.q20PromoPartSupp(spark, sfDir)
      .queryExecution.explainString(FormattedMode)
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1,
      "the classic per-(part,supp) correlated rescan must not appear")
    assert(!p.contains("CartesianProduct"), "no cartesian product")
    // the ship-window predicate reaches the one fact scan
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      "ship-date window must push into the lineitem scan")
  }

  // ---------------------------------------------------------------
  // Stale staging dir — crashed streaming attempt must not leak its
  // micro-batch id into a later corpus-driven publish
  // ---------------------------------------------------------------

  private def plantStaleIngest(storeRoot: String, nextGen: Long, bogusId: Long): Unit =
    Seq(bogusId).toDF("last_stream_batch").coalesce(1)
      .write.mode("overwrite").parquet(s"$storeRoot/.staging-$nextGen/ingest")

  private def genDirs(storeRoot: String): Seq[java.io.File] =
    Option(new java.io.File(storeRoot).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("gen=")).toSeq.sortBy(_.getName)

  test("DateStore: a crashed streaming attempt's staging ingest id does not ride into the next publish") {
    import graft.sources.DateStore
    val store = tmpDir("r11-datestale") + "/store"
    val ev0 = graft.engine.Tables.events(spark, sfDir)
      .filter(to_date(col("ts")) < lit("2024-01-05")).localCheckpoint()
    assert(DateStore.ensureIncrementalEvents(ev0, store) == "full")
    // simulate appendEvents(batch 99) crashing after the staging write,
    // before the rename: gen 1 is live, .staging-2/ingest holds 99
    plantStaleIngest(store, nextGen = 2L, bogusId = 99L)
    val ev1 = graft.engine.Tables.events(spark, sfDir)
      .filter(to_date(col("ts")) < lit("2024-01-07")).localCheckpoint()
    assert(DateStore.ensureIncrementalEvents(ev1, store) == "incremental")
    val g2 = genDirs(store).last
    assert(!new java.io.File(g2, "ingest").exists(),
      s"stale staging ingest id leaked into ${g2.getName} — batch 99 would replay as a silent skip")
    // and the never-committed batch is indeed NOT absorbed: its delivery
    // ingests rather than skipping
    val batch = graft.engine.Tables.events(spark, sfDir)
      .filter(to_date(col("ts")) === lit("2024-01-07")).localCheckpoint()
    assert(DateStore.appendEvents(batch, store, 99L) != "skip",
      "batch 99 was never committed — a skip is silent data loss")
  }

  test("IvfStore: a crashed streaming attempt's staging ingest id does not ride into the next publish") {
    import graft.operators.IvfStore
    val store = tmpDir("r11-ivfstale") + "/store"
    def vecs(n: Int) = (0L until n.toLong).map { i =>
      (i, Seq(math.cos(i * 0.07).toFloat, math.sin(i * 0.07).toFloat, 0f, 0f), (i % 3).toInt)
    }.toDF("vec_id", "embedding", "label")
    IvfStore.buildVecs(vecs(64), store)
    plantStaleIngest(store, nextGen = 2L, bogusId = 99L)
    // corpus-driven append path (ingestId = None) publishes gen 2
    assert(IvfStore.ensureIncrementalVecs(vecs(80).localCheckpoint(), store)
      == "incremental")
    val g2 = genDirs(store).last
    assert(!new java.io.File(g2, "ingest").exists(),
      s"stale staging ingest id leaked into ${g2.getName} — batch 99 would replay as a silent skip")
    assert(IvfStore.appendVectors(
      (80L to 83L).map(i => (i, Seq(0f, 0f, 1f, i.toFloat / 100f), 0))
        .toDF("vec_id", "embedding", "label"), store, 99L) != "skip",
      "batch 99 was never committed — a skip is silent data loss")
  }
}
