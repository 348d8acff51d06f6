package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode
import graft.operators.StoreDirs

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

  // ---------------------------------------------------------------
  // Concurrent-writer fence — two racing maintainers: one wins, one
  // fails loudly, the store equals the winner plus a retry
  // ---------------------------------------------------------------

  private def plantFence(storeRoot: String, k: Long): Unit = {
    val f = new java.io.File(storeRoot, s".fence-$k")
    f.getParentFile.mkdirs()
    assert(f.createNewFile(), s"could not plant $f")
  }

  private def ageFence(storeRoot: String, k: Long, ageMs: Long): Unit =
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(storeRoot, s".fence-$k"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - ageMs))

  test("DateStore fence: a held generation makes the second writer fail loudly; a stale fence is reclaimed; retry converges") {
    import graft.sources.DateStore
    val store = tmpDir("r11-datefence") + "/store"
    val ev = graft.engine.Tables.events(spark, sfDir).localCheckpoint()
    def upTo(d: String) = ev.filter(to_date(col("ts")) < lit(d))
    // the initial history must dominate, or the later appends trip the
    // >50%-changed-mass compaction threshold and legitimately rebuild
    assert(DateStore.ensureIncrementalEvents(upTo("2024-01-15"), store) == "full")
    // writer A holds generation 2 (fresh fence, mid-maintenance): writer
    // B must fail LOUDLY, not bury A's work
    plantFence(store, 2L)
    val e = intercept[IllegalStateException] {
      DateStore.ensureIncrementalEvents(upTo("2024-01-18"), store)
    }
    assert(e.getMessage.contains("concurrent writer"), e.getMessage)
    // ... and B's failure wrote NOTHING: no __batch=2 data dir appeared
    assert(!new java.io.File(s"$store/days/__batch=2").exists(),
      "the losing writer must fail before its first shared-path write")
    // A crashed instead: its fence goes stale past the lease — the next
    // writer reclaims and proceeds
    ageFence(store, 2L, ageMs = StoreDirs.staleFenceMs + 60000L)
    assert(DateStore.ensureIncrementalEvents(upTo("2024-01-18"), store) == "incremental")
    // B's original intent retries cleanly from the advanced state
    assert(DateStore.ensureIncrementalEvents(upTo("2024-01-20"), store) == "incremental")
    val got = DateStore.readEvents(spark, store).select("event_id")
      .collect().map(_.getLong(0)).toSet
    val want = upTo("2024-01-20").select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == want, "store must equal the winner plus the retry")
  }

  test("fence race: two simultaneous DateStore maintainers never interleave — at most one gen per number, loser loud, retry converges") {
    import graft.sources.DateStore
    val store = tmpDir("r11-daterace") + "/store"
    val ev = graft.engine.Tables.events(spark, sfDir).localCheckpoint()
    def upTo(d: String) = ev.filter(to_date(col("ts")) < lit(d))
    assert(DateStore.ensureIncrementalEvents(upTo("2024-01-05"), store) == "full")
    val evA = upTo("2024-01-15").localCheckpoint()
    val evB = upTo("2024-01-20").localCheckpoint()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    def run(evX: org.apache.spark.sql.DataFrame) = Future {
      barrier.await()
      try Right(DateStore.ensureIncrementalEvents(evX, store))
      catch { case e: IllegalStateException => Left(e) }
    }
    // launch BOTH futures before awaiting either — the barrier needs
    // two live parties
    val (fa, fb) = (run(evA), run(evB))
    val (ra, rb) = (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf))
    // invariant 1: any loss is LOUD (IllegalStateException), never silent
    Seq(ra, rb).foreach {
      case Left(e) => assert(e.getMessage.contains("concurrent writer") ||
        e.getMessage.contains("store advanced"), e.getMessage)
      case Right(m) => assert(Set("incremental", "full", "noop").contains(m))
    }
    // invariant 2: at least one writer succeeded
    assert(Seq(ra, rb).exists(_.isRight), s"both failed: $ra / $rb")
    // invariant 3: generation numbers are unique — no buried publish
    val ks = Option(new java.io.File(store).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith("gen=")).toSeq
      .map(_.stripPrefix("gen=").takeWhile(_ != '_').toLong)
    assert(ks.distinct.size == ks.size, s"duplicate generation numbers: $ks")
    // invariant 4: a retry from the settled state converges exactly
    val m = DateStore.ensureIncrementalEvents(evB, store)
    assert(m == "incremental" || m == "noop" || m == "full", m)
    val got = DateStore.readEvents(spark, store).select("event_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == evB.select("event_id").collect().map(_.getLong(0)).toSet)
  }

  test("LabelStore and IvfStore fences: a held generation refuses the second maintainer before any index write") {
    import graft.operators.{IvfStore, LabelStore}
    // label store
    val ldir = tmpDir("r11-labelfence")
    def docs(n: Int) = (0L until n.toLong)
      .map(i => (i, (0 until 30).map(j => s"d${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("source", lit("s")).withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val lstore = s"$ldir/store"
    LabelStore.buildDocs(docs(20).localCheckpoint(), lstore)
    plantFence(lstore, 2L)
    val le = intercept[IllegalStateException] {
      LabelStore.ensureIncrementalDocs(docs(25).localCheckpoint(), lstore)
    }
    assert(le.getMessage.contains("concurrent writer"), le.getMessage)
    ageFence(lstore, 2L, StoreDirs.staleFenceMs + 60000L)
    assert(LabelStore.ensureIncrementalDocs(docs(25).localCheckpoint(), lstore)
      == "incremental")
    // ivf store
    val vstore = tmpDir("r11-ivffence") + "/store"
    def vecs(n: Int) = (0L until n.toLong).map { i =>
      (i, Seq(math.cos(i * 0.07).toFloat, math.sin(i * 0.07).toFloat, 0f, 0f), 0)
    }.toDF("vec_id", "embedding", "label")
    IvfStore.buildVecs(vecs(64), vstore)
    plantFence(vstore, 2L)
    val ve = intercept[IllegalStateException] {
      IvfStore.ensureIncrementalVecs(vecs(80).localCheckpoint(), vstore)
    }
    assert(ve.getMessage.contains("concurrent writer"), ve.getMessage)
    ageFence(vstore, 2L, StoreDirs.staleFenceMs + 60000L)
    assert(IvfStore.ensureIncrementalVecs(vecs(80).localCheckpoint(), vstore)
      == "incremental")
  }

  test("BandStore fence: a concurrent compaction fails loudly instead of nesting the published base") {
    import graft.streaming.BandStore
    val root = tmpDir("r11-bandfence")
    val store = s"$root/store"
    val admitted = s"$root/admitted"
    def batch(ids: Range) = ids.map(i =>
        (i.toLong, (0 until 20).map(j => s"b${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    BandStore.admitBatch(batch(0 until 30), 0L, store, admitted)
    BandStore.admitBatch(batch(30 until 60), 1L, store, admitted)
    // a competitor holds the first base generation (-1) of bands/
    plantFence(BandStore.bandsDir(store), -1L)
    val e = intercept[IllegalStateException] { BandStore.compactStore(spark, store) }
    assert(e.getMessage.contains("concurrent writer"), e.getMessage)
    // stale competitor: reclaimed, compaction proceeds, store intact
    ageFence(BandStore.bandsDir(store), -1L, StoreDirs.staleFenceMs + 60000L)
    BandStore.compactStore(spark, store)
    val bands = spark.read.parquet(BandStore.bandsDir(store))
    // the partition column reads back int-typed when its values fit
    assert(bands.select(col("__batch").cast("long")).distinct().collect()
      .map(_.getLong(0)).toSet == Set(-1L), "one compacted base generation")
    assert(bands.select("doc_id").distinct().count() == 60)
  }
}
