package graft

import java.util.concurrent.TimeUnit
import java.util.concurrent.atomic.AtomicInteger
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved, SparkListenerTaskStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Executor-loss fault injection (VERDICT r13 next-round #1): crossing a
  * JVM boundary was proven in round 13; SURVIVING the loss of one is the
  * actual cluster-resilience claim behind every 100 TB statement, and no
  * run had ever exercised it. This main boots its own
  * `local-cluster[3,4,1536]` (three REAL executor JVMs, children of this
  * process), then:
  *
  *   (a) kills one executor JVM (`destroyForcibly` — a hard SIGKILL,
  *       indistinguishable from a node crash) MID-FLIGHT through a heavy
  *       oracle query. Task retry + shuffle refetch must reproduce the
  *       EXACT baseline digest, and the listener bus must carry the
  *       executor-removed event (the kill verifiably happened).
  *   (b) kills one executor MID-WRITE through a LabelStore incremental
  *       maintenance call. The generation protocol must either complete
  *       (task retry absorbed the loss) or lose LOUDLY (a lost
  *       localCheckpoint block / aborted job surfaces as an exception —
  *       never a torn generation): afterwards the store must hold unique
  *       generation numbers, a bounded retry must converge, and the
  *       final labels must hash-equal a from-scratch build of the same
  *       corpus — the executor-death sibling of round 13's two-driver
  *       fence race.
  *   (c) the same discipline for the OTHER maintenance protocol: kills
  *       one executor mid-way through an IvfStore incremental append.
  *       Unique generations, bounded retry convergence, and the
  *       surviving index bit-equal (live set AND probe results) to a
  *       no-kill control that ran the identical build→append sequence.
  *   (e) the DOUBLE kill: destroys two of the three executors at once
  *       mid-LabelStore-maintenance. With `localCheckpoint` replication
  *       at 1, losing two JVMs makes pinned-block loss likely — the
  *       LOUD class ((b)'s accepted-but-never-observed branch:
  *       exception, store unchanged, never torn). Whichever class
  *       lands, the pins are identical: unique generations, bounded
  *       retry convergence, final labels hash-equal a from-scratch
  *       build. The observed class is recorded in the outcome line.
  *   (f) the AIMED double kill: six attempts, attempt i double-killing
  *       right after the i-th maintenance job completes — scanning the
  *       job boundaries where eager-localCheckpoint blocks exist but
  *       their consumers have not run, the loud class's natural
  *       window. The invariants must hold at every landed position;
  *       the per-class tally is recorded (`aimed_loud`/`aimed_ok`).
  *   (d) the T11 PRODUCTION LOOP under executor death: kills one
  *       executor mid-way through a `dedupAdmitDrain` of a multi-batch
  *       AvailableNow stream (`maxFilesPerTrigger=1` forces one
  *       micro-batch per file, so the kill lands between committed
  *       batches with more still to come). The drain either absorbs the
  *       loss (task retry inside `foreachBatch`) or terminates loudly
  *       (StreamingQueryException) — and a RE-DRAIN from the same
  *       checkpoint must converge: exactly-once replay over the
  *       idempotent per-batch store overwrite means the final admitted
  *       set equals a no-kill control's on identical input, byte for
  *       byte, whichever class occurred.
  *
  * Run as a subprocess by Round14Spec (its own cluster must not collide
  * with the suite's shared session). Writes one JSON line to args(1) and
  * exits 0 on success; any assertion failure exits nonzero with the
  * message on stdout (captured to the spec's log file).
  *
  * A kill that lands after the victim phase already finished proves
  * nothing — each phase verifies the work was still in flight when the
  * kill landed and retries the whole phase (fresh store) up to 3 times
  * otherwise, failing loudly if it can never land one.
  */
object ChaosMain {

  private implicit val ec: ExecutionContext = ExecutionContext.global

  private def executorJvms(): Seq[ProcessHandle] = {
    import scala.jdk.CollectionConverters._
    val all = ProcessHandle.current().descendants().iterator().asScala.toSeq
    // the executor command line carries the full test classpath — far
    // past what /proc-backed ProcessHandle.Info reliably returns — so
    // the class-name match is a preference, not the gate: in THIS
    // process tree the Master and Workers are in-process threads
    // (LocalSparkCluster), making every java child an executor JVM
    val named = all.filter(p => p.info().commandLine()
      .map(c => c.contains("CoarseGrainedExecutorBackend")).orElse(false))
    if (named.nonEmpty) named
    else all.filter(p => p.info().command().map(_.endsWith("java")).orElse(false))
  }

  private def digest(df: DataFrame): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    df.collect().map(_.toString).sorted.foreach(r => md.update(r.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outPath = args(1)
    val spark = Sessions.withExactMaster(SparkSession.builder(), "local-cluster[3,4,1536]")
      .appName("graft-chaos")
      .config("spark.sql.shuffle.partitions", "12")
      .config("spark.executor.memory", "1g")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(e => new graft.functions.GraftExtensions()(e))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val removed = new AtomicInteger
    val tasksStarted = new AtomicInteger
    val jobsEnded = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit =
        removed.incrementAndGet()
      override def onTaskStart(t: SparkListenerTaskStart): Unit =
        tasksStarted.incrementAndGet()
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobsEnded.incrementAndGet()
    })

    // cluster warm-up: a job wide enough that all three executors must
    // register before any phase is timed or killed
    spark.range(0, 48, 1, 48).count()

    def require(cond: Boolean, msg: => String): Unit =
      if (!cond) { println(s"CHAOS FAIL: $msg"); spark.stop(); sys.exit(1) }

    /** The listener bus is ASYNCHRONOUS: events from the setup jobs
      * that ran before a phase (store builds, baseline digests) can
      * still be draining when the phase resets its counters — stale
      * increments would satisfy minTasks/minJobs instantly and fire the
      * kill before the victim work has any tasks in flight (round-14
      * self-review). Quiesce: wait until both counters have been stable
      * for 500 ms (the setup jobs are DONE on the main thread — only
      * their event backlog is in question) before resetting.
      */
    def quiesceCounters(): Unit = {
      val deadline = System.currentTimeMillis() + 30000L
      var last = (tasksStarted.get(), jobsEnded.get())
      var stableSince = System.currentTimeMillis()
      while (System.currentTimeMillis() - stableSince < 500 &&
             System.currentTimeMillis() < deadline) {
        Thread.sleep(50)
        val now = (tasksStarted.get(), jobsEnded.get())
        if (now != last) { last = now; stableSince = System.currentTimeMillis() }
      }
    }

    /** Run `work` in a future, kill `victims` executors once `minTasks`
      * of its tasks have started and it is still in flight; returns
      * (result, killLandedMidFlight, firstKilledPid).
      */
    def killDuring[A](minTasks: Int, victims: Int = 1)(work: => A): (A, Boolean, Long) = {
      quiesceCounters()
      tasksStarted.set(0)
      val fut = Future(work)
      val deadline = System.currentTimeMillis() + 120000L
      while (tasksStarted.get() < minTasks && !fut.isCompleted &&
             System.currentTimeMillis() < deadline) Thread.sleep(5)
      var pid = -1L
      var landed = false
      if (!fut.isCompleted) {
        val vs = executorJvms().take(victims)
        vs.foreach(_.destroyForcibly()) // SIGKILL, returns immediately
        if (vs.nonEmpty) {
          pid = vs.head.pid()
          // "landed" = the signals went out while the work was STILL in
          // flight — checked before the blocking exit-wait, which could
          // otherwise outlast the victim phase and mask a too-late kill
          landed = !fut.isCompleted
          vs.foreach(_.onExit().get(30, TimeUnit.SECONDS))
        }
      }
      (Await.result(fut, 10.minutes), landed, pid)
    }

    /** [[killDuring]] aimed at a JOB BOUNDARY instead of a task count:
      * wait until `minJobs` of the work's jobs have COMPLETED, then kill
      * `victims` executors. An eager `localCheckpoint` materializes as
      * its own job, so a kill placed just after job k lands where
      * truncated-lineage blocks may already exist but their consumers
      * have not run — the aim most likely to force the loud
      * (non-recomputable) loss class.
      */
    def killAfterJobs[A](minJobs: Int, victims: Int)(work: => A): (A, Boolean, Long) = {
      quiesceCounters()
      jobsEnded.set(0)
      val fut = Future(work)
      val deadline = System.currentTimeMillis() + 120000L
      while (jobsEnded.get() < minJobs && !fut.isCompleted &&
             System.currentTimeMillis() < deadline) Thread.sleep(2)
      var pid = -1L
      var landed = false
      if (!fut.isCompleted) {
        val vs = executorJvms().take(victims)
        vs.foreach(_.destroyForcibly())
        if (vs.nonEmpty) {
          pid = vs.head.pid()
          landed = !fut.isCompleted
          vs.foreach(_.onExit().get(30, TimeUnit.SECONDS))
        }
      }
      (Await.result(fut, 10.minutes), landed, pid)
    }

    // ---------------------------------------------------------------
    // (a) heavy oracle query: exact digest across an executor loss.
    // q9 is the suite's heaviest pure-dataflow TPC-H plan (no
    // localCheckpoint — a lost pinned block is NON-recomputable by
    // design and belongs to phase (b)'s loud-loss class). At sf0.1 it
    // finishes too fast for a kill to reliably land inside (a
    // self-union would NOT stretch it — ReuseExchange collapses
    // identical branches), so the chaos data dir carries lineitem
    // inflated ×8 (rows duplicated — join fan-out and aggregates scale
    // deterministically, the digest stays exact) with the other tables
    // symlinked; one execution then spans many seconds of multi-stage
    // shuffle work.
    // ---------------------------------------------------------------
    val work = java.nio.file.Files.createTempDirectory("graft-chaos").toString
    val chaosData = s"$work/data"
    new java.io.File(chaosData).mkdirs()
    new java.io.File(sfDir).listFiles().filter(_.getName.endsWith(".parquet"))
      .filter(_.getName != "lineitem.parquet")
      .foreach(f => java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(chaosData, f.getName), f.toPath))
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    (1 to 8).map(_ => li).reduce(_ unionByName _).repartition(24)
      .write.mode("overwrite").parquet(s"$chaosData/lineitem.parquet")
    val q = () => graft.operators.Analytics.q9ProfitShape(spark, chaosData)
    val baseDigest = digest(q())
    var queryLanded = false
    var queryPid = -1L
    var queryDigest = ""
    var attempts = 0
    while (!queryLanded && attempts < 3) {
      attempts += 1
      val removedBefore = removed.get()
      val (d, landed, pid) = killDuring(4)(digest(q()))
      queryDigest = d
      queryLanded = landed
      queryPid = pid
      if (landed) {
        // the kill must be VISIBLE on the listener bus, not inferred
        val evDeadline = System.currentTimeMillis() + 30000L
        while (removed.get() == removedBefore &&
               System.currentTimeMillis() < evDeadline) Thread.sleep(50)
        require(removed.get() > removedBefore,
          "killed an executor but no SparkListenerExecutorRemoved arrived")
      }
    }
    require(queryLanded, s"could not land a mid-query kill in $attempts attempts")
    require(queryDigest == baseDigest,
      s"post-kill query digest diverged: $queryDigest vs $baseDigest")

    // ---------------------------------------------------------------
    // (b) store maintenance: kill mid-write, never a torn generation
    // ---------------------------------------------------------------
    import graft.operators.LabelStore
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus0 = s"$work/corpus0"
    val corpus1 = s"$work/corpus1"
    docs.filter(col("doc_id") % 10 =!= 7).repartition(12)
      .write.mode("overwrite").parquet(s"$corpus0/documents.parquet")
    docs.repartition(12)
      .write.mode("overwrite").parquet(s"$corpus1/documents.parquet")

    var storeLanded = false
    var storeOutcome = ""
    var storePid = -1L
    var store = ""
    attempts = 0
    while (!storeLanded && attempts < 3) {
      attempts += 1
      store = s"$work/store-$attempts"
      LabelStore.build(spark, corpus0, store)
      val removedBefore = removed.get()
      val (out, landed, pid) = killDuring(4) {
        try Right(LabelStore.ensureCurrentIncremental(spark, corpus1, store))
        catch { case e: Exception => Left(e.toString.take(400)) }
      }
      storeLanded = landed
      storePid = pid
      storeOutcome = out.fold(m => s"loud:$m", m => s"ok:$m")
      if (landed) {
        val evDeadline = System.currentTimeMillis() + 30000L
        while (removed.get() == removedBefore &&
               System.currentTimeMillis() < evDeadline) Thread.sleep(50)
        require(removed.get() > removedBefore,
          "killed an executor mid-maintenance but no executor-removed event arrived")
      }
    }
    require(storeLanded, s"could not land a mid-maintenance kill in $attempts attempts")
    require(storeOutcome.startsWith("ok:") || storeOutcome.startsWith("loud:"),
      s"unclassified maintenance outcome: $storeOutcome")

    // never torn: generation numbers unique whatever the outcome
    val gens = Option(new java.io.File(store).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith("gen=")).toSeq
      .map(_.stripPrefix("gen=").takeWhile(_ != '_').toLong)
    require(gens.distinct.size == gens.size, s"duplicate generations after kill: $gens")

    // a bounded retry converges from whatever state the kill left
    var retries = 0
    var retried = ""
    while (retried == "" && retries < 3) {
      retries += 1
      try retried = LabelStore.ensureCurrentIncremental(spark, corpus1, store)
      catch { case _: Exception if retries < 3 => Thread.sleep(1000) }
    }
    require(Set("noop", "incremental", "full").contains(retried),
      s"retry after kill did not converge: '$retried'")

    // and the surviving store hash-equals a from-scratch build
    val fresh = s"$work/store-fresh"
    LabelStore.build(spark, corpus1, fresh)
    val survived = digest(LabelStore.read(spark, store))
    val scratch = digest(LabelStore.read(spark, fresh))
    require(survived == scratch,
      s"post-kill store labels diverged from from-scratch: $survived vs $scratch")

    // ---------------------------------------------------------------
    // (e) the DOUBLE kill: two of three executors destroyed at once
    // mid-LabelStore-maintenance — the harshest loss short of losing
    // the driver, and the likeliest route to the LOUD class (a pinned
    // localCheckpoint block with replication 1 dies with its JVM and is
    // non-recomputable by design). Both classes legal; identical pins.
    // ---------------------------------------------------------------
    var dblLanded = false
    var dblOutcome = ""
    var dblPid = -1L
    var dblStore = ""
    attempts = 0
    while (!dblLanded && attempts < 3) {
      attempts += 1
      dblStore = s"$work/store-dbl-$attempts"
      LabelStore.build(spark, corpus0, dblStore)
      val removedBefore = removed.get()
      val (out, landed, pid) = killDuring(4, victims = 2) {
        try Right(LabelStore.ensureCurrentIncremental(spark, corpus1, dblStore))
        catch { case e: Exception => Left(e.toString.take(400)) }
      }
      dblLanded = landed
      dblPid = pid
      dblOutcome = out.fold(m => s"loud:$m", m => s"ok:$m")
      if (landed) {
        val evDeadline = System.currentTimeMillis() + 30000L
        while (removed.get() < removedBefore + 2 &&
               System.currentTimeMillis() < evDeadline) Thread.sleep(50)
        require(removed.get() >= removedBefore + 2,
          "double-killed executors but fewer than 2 executor-removed events arrived")
      }
    }
    require(dblLanded, s"could not land a double kill in $attempts attempts")

    val dblGens = Option(new java.io.File(dblStore).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith("gen=")).toSeq
      .map(_.stripPrefix("gen=").takeWhile(_ != '_').toLong)
    require(dblGens.distinct.size == dblGens.size,
      s"duplicate generations after double kill: $dblGens")

    var dblRetries = 0
    var dblRetried = ""
    while (dblRetried == "" && dblRetries < 3) {
      dblRetries += 1
      try dblRetried = LabelStore.ensureCurrentIncremental(spark, corpus1, dblStore)
      catch { case _: Exception if dblRetries < 3 => Thread.sleep(1000) }
    }
    require(Set("noop", "incremental", "full").contains(dblRetried),
      s"retry after double kill did not converge: '$dblRetried'")

    val dblFresh = s"$work/store-dbl-fresh"
    LabelStore.build(spark, corpus1, dblFresh)
    require(digest(LabelStore.read(spark, dblStore)) ==
            digest(LabelStore.read(spark, dblFresh)),
      "post-double-kill store labels diverged from from-scratch")

    // ---------------------------------------------------------------
    // (f) the AIMED double kill: scan the maintenance job sequence for
    // the loud-loss window. Attempt i kills two executors right after
    // the i-th job of ensureCurrentIncremental completes — the
    // positions where an eager localCheckpoint's truncated-lineage
    // blocks exist but their consuming jobs have not run. Six
    // positions scanned; EVERY outcome must satisfy the invariants
    // (never torn, retry converges, hash-equal from-scratch); whether
    // the loud class was actually observed is recorded, not required —
    // Spark may absorb even these (e.g. blocks replicated to the
    // survivor or recomputed before truncation commits).
    // ---------------------------------------------------------------
    var aimedLoud = 0
    var aimedOk = 0
    var aimedLanded = 0
    (1 to 6).foreach { pos =>
      val aStore = s"$work/store-aim-$pos"
      LabelStore.build(spark, corpus0, aStore)
      val (out, landed, _) = killAfterJobs(pos, victims = 2) {
        try Right(LabelStore.ensureCurrentIncremental(spark, corpus1, aStore))
        catch { case e: Exception => Left(e.toString.take(200)) }
      }
      if (landed) {
        aimedLanded += 1
        out.fold(_ => aimedLoud += 1, _ => aimedOk += 1)
        // invariants hold at EVERY aim position, whatever the class
        val ag = Option(new java.io.File(aStore).listFiles()).getOrElse(Array.empty)
          .map(_.getName).filter(_.startsWith("gen=")).toSeq
          .map(_.stripPrefix("gen=").takeWhile(_ != '_').toLong)
        require(ag.distinct.size == ag.size,
          s"duplicate generations after aimed kill at job $pos: $ag")
        var r = ""
        var n = 0
        while (r == "" && n < 3) {
          n += 1
          try r = LabelStore.ensureCurrentIncremental(spark, corpus1, aStore)
          catch { case _: Exception if n < 3 => Thread.sleep(1000) }
        }
        require(Set("noop", "incremental", "full").contains(r),
          s"retry after aimed kill at job $pos did not converge: '$r'")
        val aFresh = s"$work/store-aim-$pos-fresh"
        LabelStore.build(spark, corpus1, aFresh)
        require(digest(LabelStore.read(spark, aStore)) ==
                digest(LabelStore.read(spark, aFresh)),
          s"aimed kill at job $pos: store diverged from from-scratch")
      }
    }
    require(aimedLanded >= 3,
      s"only $aimedLanded of 6 aimed kills landed mid-flight — scan inconclusive")

    // ---------------------------------------------------------------
    // (c) the vector store, same discipline: kill mid-way through an
    // IvfStore incremental append (VERDICT r13 #1 named BOTH store
    // maintenance paths; (b) covered LabelStore). Equality target: a
    // NO-KILL CONTROL store that ran the identical build→append
    // sequence — a from-scratch rebuild would train fresh centroids and
    // legitimately differ, but the incremental path is deterministic
    // given (base subset, delta), so the survivor must match the
    // control bit-for-bit, in what it serves (liveVectors) and in what
    // a probe returns.
    // ---------------------------------------------------------------
    import graft.operators.IvfStore
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nVecs = emb.agg(max(col("vec_id"))).head.getLong(0) + 1
    // ×8 inflation (the lineitem trick): distinct ids, same vectors —
    // at sf0.1's native 2k vectors the append finishes before a kill
    // can land; 16k gives the delta-classify + assign + publish chain
    // several seconds of multi-stage work
    val embBig = (0 until 8).map(i =>
        emb.select((col("vec_id") + lit(i * nVecs)).as("vec_id"),
          col("embedding"), col("label")))
      .reduce(_ unionByName _).repartition(24)
    val corpusV0 = s"$work/vcorpus0"
    val corpusV1 = s"$work/vcorpus1"
    embBig.filter(col("vec_id") % 10 =!= 7)
      .write.mode("overwrite").parquet(s"$corpusV0/embeddings.parquet")
    embBig.write.mode("overwrite").parquet(s"$corpusV1/embeddings.parquet")

    val vControl = s"$work/vstore-control"
    IvfStore.build(spark, corpusV0, vControl)
    val ctrlMode = IvfStore.ensureCurrentIncremental(spark, corpusV1, vControl)
    require(ctrlMode == "incremental",
      s"control IVF maintenance did not take the append path: '$ctrlMode'")

    var ivfLanded = false
    var ivfOutcome = ""
    var ivfPid = -1L
    var vstore = ""
    attempts = 0
    while (!ivfLanded && attempts < 3) {
      attempts += 1
      vstore = s"$work/vstore-$attempts"
      IvfStore.build(spark, corpusV0, vstore)
      val removedBefore = removed.get()
      val (out, landed, pid) = killDuring(4) {
        try Right(IvfStore.ensureCurrentIncremental(spark, corpusV1, vstore))
        catch { case e: Exception => Left(e.toString.take(400)) }
      }
      ivfLanded = landed
      ivfPid = pid
      ivfOutcome = out.fold(m => s"loud:$m", m => s"ok:$m")
      if (landed) {
        val evDeadline = System.currentTimeMillis() + 30000L
        while (removed.get() == removedBefore &&
               System.currentTimeMillis() < evDeadline) Thread.sleep(50)
        require(removed.get() > removedBefore,
          "killed an executor mid-IVF-maintenance but no executor-removed event arrived")
      }
    }
    require(ivfLanded, s"could not land a mid-IVF-maintenance kill in $attempts attempts")

    // never torn: generation ks unique whatever the outcome
    val vgens = Option(new java.io.File(vstore).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith("gen=")).toSeq
      .map(_.stripPrefix("gen=").takeWhile(_ != '_').toLong)
    require(vgens.distinct.size == vgens.size,
      s"duplicate IVF generations after kill: $vgens")

    var ivfRetries = 0
    var ivfRetried = ""
    while (ivfRetried == "" && ivfRetries < 3) {
      ivfRetries += 1
      try ivfRetried = IvfStore.ensureCurrentIncremental(spark, corpusV1, vstore)
      catch { case _: Exception if ivfRetries < 3 => Thread.sleep(1000) }
    }
    require(Set("noop", "incremental").contains(ivfRetried),
      s"IVF retry after kill did not converge on the append path: '$ivfRetried'")

    val liveCols = Seq("vec_id", "e", "norm", "c_id").map(col)
    val vSurvived = digest(IvfStore.liveVectors(spark, vstore).select(liveCols: _*))
    val vCtrl = digest(IvfStore.liveVectors(spark, vControl).select(liveCols: _*))
    require(vSurvived == vCtrl,
      s"post-kill IVF live set diverged from the no-kill control: $vSurvived vs $vCtrl")
    val vProbe = digest(IvfStore.probe(spark, corpusV1, vstore))
    val vProbeCtrl = digest(IvfStore.probe(spark, corpusV1, vControl))
    require(vProbe == vProbeCtrl,
      s"post-kill IVF probe diverged from the no-kill control: $vProbe vs $vProbeCtrl")

    // ---------------------------------------------------------------
    // (d) the streaming admission loop: kill mid-drain, re-drain from
    // the same checkpoint, admitted set equals the no-kill control
    // ---------------------------------------------------------------
    import graft.streaming.Streams
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def docLine(id: Long): String = {
      // every 5th doc duplicates an earlier one's text, so the kill
      // lands on real veto work (store probe + in-batch pre-filter),
      // not just pass-through admission
      val base = if (id % 5 == 4) id - 4 else id
      val words = (0 until 25).map(j => s"w${base}_$j").mkString(" ")
      s"""{"doc_id":$id,"text":"$words"}"""
    }
    def writeTopic(dir: String): Unit = {
      new java.io.File(dir).mkdirs()
      (0 until 6).foreach { f =>
        val ids = (f * 500L) until (f * 500L + 500L)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$dir/b$f.json"),
          ids.map(docLine).mkString("\n"))
      }
    }
    def drainSrc(topic: String) = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "1").json(topic)
    def admittedSet(dir: String): Set[Long] =
      spark.read.parquet(dir).select("doc_id").collect().map(_.getLong(0)).toSet

    val ctrlTopic = s"$work/drain-ctrl-topic"
    writeTopic(ctrlTopic)
    Streams.dedupAdmitDrain(drainSrc(ctrlTopic), s"$work/drain-ctrl-store",
      s"$work/drain-ctrl-admitted", s"$work/drain-ctrl-ckpt")
    val ctrlAdmitted = admittedSet(s"$work/drain-ctrl-admitted")
    require(ctrlAdmitted.nonEmpty, "control drain admitted nothing")

    var drainLanded = false
    var drainOutcome = ""
    var drainPid = -1L
    var drainRoot = ""
    attempts = 0
    while (!drainLanded && attempts < 3) {
      attempts += 1
      drainRoot = s"$work/drain-$attempts"
      val topic = s"$drainRoot/topic"
      writeTopic(topic)
      val removedBefore = removed.get()
      val (out, landed, pid) = killDuring(4) {
        try Right(Streams.dedupAdmitDrain(drainSrc(topic), s"$drainRoot/store",
          s"$drainRoot/admitted", s"$drainRoot/ckpt"))
        catch { case e: Exception => Left(e.toString.take(400)) }
      }
      drainLanded = landed
      drainPid = pid
      drainOutcome = out.fold(m => s"loud:$m", _ => "ok")
      if (landed) {
        val evDeadline = System.currentTimeMillis() + 30000L
        while (removed.get() == removedBefore &&
               System.currentTimeMillis() < evDeadline) Thread.sleep(50)
        require(removed.get() > removedBefore,
          "killed an executor mid-drain but no executor-removed event arrived")
      }
    }
    require(drainLanded, s"could not land a mid-drain kill in $attempts attempts")

    // converge: a re-drain from the SAME checkpoint replays at most the
    // uncommitted batch into the idempotent per-batch overwrite; after
    // it, the admitted set must equal the control's exactly
    var drainRetries = 0
    var drainConverged = false
    while (!drainConverged && drainRetries < 3) {
      drainRetries += 1
      try {
        Streams.dedupAdmitDrain(drainSrc(s"$drainRoot/topic"), s"$drainRoot/store",
          s"$drainRoot/admitted", s"$drainRoot/ckpt")
        drainConverged = true
      } catch { case _: Exception if drainRetries < 3 => Thread.sleep(1000) }
    }
    require(drainConverged, "re-drain after kill did not converge in 3 attempts")
    val chaosAdmitted = admittedSet(s"$drainRoot/admitted")
    require(chaosAdmitted == ctrlAdmitted,
      s"post-kill admitted set diverged from the no-kill control: " +
        s"${(chaosAdmitted -- ctrlAdmitted).take(5)} extra, " +
        s"${(ctrlAdmitted -- chaosAdmitted).take(5)} missing")

    val line =
      s"""{"query_kill_pid":$queryPid,"query_digest_equal":true,""" +
      s""""store_kill_pid":$storePid,"store_outcome":"${storeOutcome.replace("\"", "'")}",""" +
      s""""store_retry":"$retried","store_equal":true,""" +
      s""""ivf_kill_pid":$ivfPid,"ivf_outcome":"${ivfOutcome.replace("\"", "'")}",""" +
      s""""ivf_retry":"$ivfRetried","ivf_equal":true,""" +
      s""""drain_kill_pid":$drainPid,"drain_outcome":"${drainOutcome.replace("\"", "'")}",""" +
      s""""drain_equal":true,""" +
      s""""dbl_kill_pid":$dblPid,"dbl_outcome":"${dblOutcome.replace("\"", "'")}",""" +
      s""""dbl_retry":"$dblRetried","dbl_equal":true,""" +
      s""""aimed_landed":$aimedLanded,"aimed_loud":$aimedLoud,"aimed_ok":$aimedOk,""" +
      s""""executor_removed_events":${removed.get()}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line)
    println(line)
    spark.stop()
  }
}
