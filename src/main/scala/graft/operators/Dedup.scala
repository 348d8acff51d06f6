package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** [EXT] Deduplication operators over `documents` (SURVEY.md §2.7 X1/X2):
  * exact, exact-all-pairs n-gram Jaccard, MinHash+LSH, and SimHash.
  *
  * Scale design (100 TB): exact dedup is one hash aggregate on a text
  * digest. The all-pairs Jaccard form exists as the small-data oracle
  * twin; the scale path is MinHash+LSH — per-doc signature (narrow map,
  * no shuffle), explode to (band, bandHash) keys (32×), self-join on
  * band buckets (shuffle proportional to candidate pairs, not n²), then
  * exact verification only on candidates via array intersection. SimHash
  * gives the complementary hamming-distance family with 16-bit band
  * buckets. All hash arithmetic is pmod-bounded below 2^62 — Spark 4 runs
  * ANSI mode, where silent long overflow is an error.
  */
object Dedup {

  /** X1 — exact dedup: keep the min-doc_id representative per identical
    * text. One shuffle on the (digested) text key.
    */
  def x1Exact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
      .select(col("keeper_id"), col("n_copies"), length(col("text")).as("text_len"))
      .orderBy("keeper_id")

  val x1Sql: String =
    """SELECT min(doc_id) AS keeper_id, count(*) AS n_copies,
      |  CAST(length(text) AS INTEGER) AS text_len
      |FROM documents GROUP BY text ORDER BY keeper_id""".stripMargin

  /** 128-bit exact-text group key: two independent 64-bit xxhash64
    * lanes (the second salted). A single 64-bit digest collides at
    * birthday scale ~5×10⁹ texts — a real number at the 100 TB corpus
    * this engine targets — and a collision would silently merge two
    * DIFFERENT texts into one exact-group, fabricating their near-dup
    * pairs. Two lanes push the bound to ~10¹⁹ texts. Both are codegen'd
    * single-pass hashes, still far cheaper than shuffling the text
    * itself as the key (x1Exact can afford the full text because its
    * whole job is that one shuffle; the collapse is a side-stage of a
    * larger pipeline).
    */
  private[graft] def textKey: Column =
    struct(xxhash64(col("text")).as("h1"),
      xxhash64(lit(0x9E3779B97F4A7C15L), col("text")).as("h2"))

  /** Distinct 3-token shingles of `text` (the near-dup granularity —
    * token *sets* are degenerate on a 31-token vocabulary). Built from
    * the passed Column, so any string column works, not just one named
    * `text`.
    */
  def shingles(text: Column): Column = {
    val toks = split(text, " ")
    val shingleAt = (i: Column) =>
      concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))
    array_distinct(transform(sequence(lit(1), size(toks) - 2), shingleAt))
  }

  private def docShingles(s: SparkSession, dir: String): DataFrame =
    // Spread.byKey: the single-row-group fixture scan plans ONE task, so
    // shingling the whole corpus ran serially (guide §2.5 input skew);
    // no-op at production scan parallelism
    graft.engine.Spread.byKey(
        Tables.documents(s, dir).filter(size(split(col("text"), " ")) >= 3),
        "doc_id")
      .select(col("doc_id"), shingles(col("text")).as("sh"))

  /** X2a — exact all-pairs n-gram Jaccard near-dup (the oracle-checkable
    * form; quadratic in the worst case, so it is the verification twin,
    * not the scale path).
    */
  def x2Jaccard(s: SparkSession, dir: String): DataFrame = {
    // shingling feeds both self-join sides plus the two size lookups —
    // persist so the transform runs once per doc, not four times
    // (query-scoped: the harness releases it, Caches.releaseScoped)
    val ds = Caches.scoped(docShingles(s, dir))
    // join on the 8-byte shingle hash, not the shingle text: same
    // intersection counts (64-bit collisions are negligible) at a
    // fraction of the shuffle width and key-compare cost
    val ex = ds.select(col("doc_id"), explode(col("sh")).as("s0"))
      .select(col("doc_id"), xxhash64(col("s0")).as("s"))
    val sizes = ds.select(col("doc_id"), size(col("sh")).as("n"))
    val inter = ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(col("c").cast("double") / (col("sa.n") + col("sb.n") - col("c")), 6).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy("doc_a", "doc_b")
  }

  val x2JaccardSql: String =
    """WITH sh AS (
      |  SELECT doc_id, list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
      |                                for i in range(1, len(toks) - 1)]) AS s
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |  WHERE len(toks) >= 3
      |), ex AS (SELECT doc_id, unnest(s) AS s FROM sh),
      |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b, jaccard FROM (
      |  SELECT doc_a, doc_b,
      |    round(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
      |  FROM inter JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id)
      |WHERE jaccard >= 0.8 ORDER BY doc_a, doc_b""".stripMargin

  /** X2e — duplicate CLUSTERS from the near-dup pairs: connected
    * components by min-label propagation, each doc labeled with the
    * smallest doc_id reachable through near-dup edges — the step a real
    * dedup pipeline runs after pair generation (keep one representative
    * per component, not per pair; A–B and B–C must collapse to one
    * cluster even though A–C was never compared).
    *
    * Each round combines one edge hop with pointer doubling, so k rounds
    * cover diameter ≤ 2^k — O(log diameter) total, the same convergence
    * class as the large-star/small-star discipline but with the label
    * table (not a rewritten edge set) as the iterated state; the
    * driver-side loop is iteration control, not data movement.
    * Oracle: DuckDB recursive CTE computing min-reachable per doc.
    */
  def x2DupClusters(s: SparkSession, dir: String): DataFrame =
    x2DupClustersOf(Tables.documents(s, dir))

  /** Frame-based form of [[x2DupClusters]] (see [[x2MinHashLshOf]]). */
  private[graft] def x2DupClustersOf(corpus: DataFrame,
                                     preSigned: Option[DataFrame] = None): DataFrame = {
    // pairs come from the LSH SCALE path, not the quadratic all-pairs
    // twin — banding + exact verification yields the identical pair set
    // (that equality is x2_minhash_lsh's own oracle), so the cluster
    // result is unchanged while the pair stage stays candidate-bounded
    clusterPairs(x2MinHashLshOf(corpus, preSigned).select(col("doc_a"), col("doc_b")))._1
  }

  /** Min-label connected components over an undirectable (doc_a, doc_b)
    * pair set; returns (labels, rounds-to-fixpoint) — the round count is
    * what the planted long-chain stress asserts stays logarithmic.
    */
  private[graft] def clusterPairs(pairs: DataFrame): (DataFrame, Int) = {
    // a MEASURED-small graph runs its fixpoint driver-side — the
    // broadcast-join discipline applied to iteration control: Spark
    // itself centralizes a join side once a size measurement says it
    // fits (autoBroadcastJoinThreshold), and a dup graph under the bound
    // (~16 MB of long pairs) costs less to union-find in one pass than
    // one distributed round's scheduler overhead, let alone the
    // O(log diameter) rounds × (2 joins + agg + checkpoint) jobs of the
    // loop below. This is where delta-append/delete maintenance lives:
    // the CONTRACTED graph of a bounded delta is delta-sized, so store
    // maintenance pays array arithmetic, not per-round job latency.
    // The candidate/verify pipeline ABOVE the pairs is materialized
    // exactly ONCE — the undirected checkpoint below — and the probe
    // reads its blocks (round-10 review, twice): probing the raw frame
    // re-ran the whole pipeline on overflow, and a first fix that
    // checkpointed the DIRECTED pairs separately before doubling left
    // a second full copy of the graph pinned through every fixpoint
    // round (the 22M-edge stress row inflated 55 → 91 s from the
    // memory pressure alone). The probe collects up to 2·bound doubled
    // edges — the union-find dedupes them — so an overflow costs one
    // bounded collect of pinned blocks, nothing more. The result is
    // identical by construction (min reachable doc per component);
    // crawl-scale graphs stay distributed, and tests pinning the
    // distributed round count force it via the conf.
    val session = pairs.sparkSession
    val driverMax = session.conf.get(DriverMaxEdgesConf, "1000000").toLong
    // the graph is still orders of magnitude smaller than the corpus
    // (near-dups are sparse by definition) — materialize it eagerly
    // with lineage truncated (otherwise every propagation round drags
    // the whole Jaccard pipeline through its plan)
    val edgesRaw = pairs.unionByName(
        pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .localCheckpoint()
    // the distributed path needs the measured edge count anyway, and on
    // checkpointed blocks a count is near-free — so the size decision
    // IS the count, and the driver path collects only graphs it will
    // actually keep (a crawl-scale overflow transfers nothing)
    val nEdges = edgesRaw.count()
    if (driverMax > 0 && nEdges <= 2L * driverMax && nEdges < Int.MaxValue - 1L) {
      import session.implicits._
      val labels = driverComponents(edgesRaw.as[(Long, Long)].collect())
      // free the checkpoint blocks before returning: a small-graph call
      // must leave NO block state (maintenance paths call this many
      // times per session, and orphaned checkpoint blocks accumulated
      // until later phases paid for them in memory pressure)
      StoreDirs.freePinned(edgesRaw)
      return (labels.toSeq.sortBy(_._1).toDF("doc_id", "cluster_rep"), 0)
    }
    // distributed path: size the edge partitioning from the MEASURED
    // edge count, so each round's shuffle is proportional to the graph:
    // a crawl-scale dup graph of billions of edges gets the partitions
    // its volume demands instead of serializing through a constant
    val parts = edgePartitions(nEdges,
      edgesRaw.sparkSession.conf.get(EdgesPerPartitionConf, "1000000").toLong)
    // coalesce (narrow, reads the checkpoint) when shrinking; repartition
    // only when the graph outgrows the corpus-inherited partitioning
    val inherited = edgesRaw.rdd.getNumPartitions
    val edges =
      if (parts < inherited) edgesRaw.coalesce(parts)
      else if (parts > inherited) edgesRaw.repartition(parts)
      else edgesRaw
    // initialize one hop AHEAD: label₀ = min(self, neighbors) is exactly
    // the state after the first neighbor round of a self-labeled start,
    // for the same single shuffle the distinct() would have cost — every
    // graph converges one round earlier
    var labels = edges.groupBy(col("doc_a"))
      .agg(min(col("doc_b")).as("__mn"))
      .select(col("doc_a").as("doc"), least(col("doc_a"), col("__mn")).as("label"))
      .localCheckpoint()
    // iterate to the FIXPOINT, not a fixed round count: a duplicate
    // chain longer than any hardcoded k would silently mislabel.
    // Each round combines one edge hop (neighbor's label) with pointer
    // DOUBLING (my label's label — a label is the min REACHABLE doc, so
    // it is itself a key in the table), squaring the reach per round:
    // convergence in O(log diameter) rounds, the distributed
    // connected-components discipline. Min-propagation labels only
    // decrease, so an unchanged label sum proves convergence — one
    // cheap aggregate per round over the (tiny, lineage-truncated)
    // label table. The 50-round cap is a backstop at diameter ~2^50.
    // On an empty edge set the first round's sum is 0 == the initial sum,
    // so the loop exits after one trivial pass over empty frames — no
    // separate emptiness action.
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("label")), lit(0L))).head.getLong(0)
    var prevSum = labelSum(labels)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 50) {
      val prev = labels
      val viaNeighbor = edges
        .join(labels, edges("doc_b") === labels("doc"))
        .select(edges("doc_a").as("doc"), col("label"))
      val viaDouble = labels.as("a")
        .join(labels.as("b"), col("a.label") === col("b.doc"))
        .select(col("a.doc").as("doc"), col("b.label").as("label"))
      labels = labels.unionByName(viaNeighbor).unionByName(viaDouble)
        .groupBy(col("doc")).agg(min(col("label")).as("label"))
        .localCheckpoint()
      // the new checkpoint is eager — the superseded round's blocks are
      // dead weight from here; freeing them bounds the fixpoint's block
      // footprint at TWO label tables instead of one per round (up to
      // 50 on a pathological diameter)
      StoreDirs.freePinned(prev)
      val s = labelSum(labels)
      converged = s == prevSum
      prevSum = s
      rounds += 1
    }
    // the edge blocks served their last join; only the final label
    // checkpoint (the caller's result) stays pinned
    StoreDirs.freePinned(edgesRaw)
    (labels.select(col("doc").as("doc_id"), col("label").as("cluster_rep"))
      .orderBy("doc_id"), rounds)
  }

  /** Edge rows per propagation-round partition
    * (`spark.graft.cluster.edgesPerPartition`, default 1M ≈ tens of MB
    * of (long, long) rows — comfortably in-memory per task).
    */
  private[graft] val EdgesPerPartitionConf = "spark.graft.cluster.edgesPerPartition"

  /** Directed-edge count at or under which [[clusterPairs]] runs its
    * fixpoint driver-side (`spark.graft.cluster.driverMaxEdges`). The
    * driver collects the DOUBLED edge list — up to 2× this bound of
    * long pairs, ≈ 32 MB at the 1M default — still the
    * autoBroadcastJoinThreshold size class, but size driver memory for
    * the doubled figure. 0 forces the distributed path (the
    * round-count specs and the diameter stress set it).
    */
  private[graft] val DriverMaxEdgesConf = "spark.graft.cluster.driverMaxEdges"

  /** Union-find (path-halving + union by rank) over a collected edge
    * list; returns doc → min reachable doc — definitionally the same
    * labeling the distributed min-propagation converges to.
    */
  private[graft] def driverComponents(edges: Array[(Long, Long)]): Array[(Long, Long)] = {
    val parent = new java.util.HashMap[Long, Long]()
    val rank = new java.util.HashMap[Long, Int]()
    def find(x0: Long): Long = {
      var x = x0
      if (!parent.containsKey(x)) { parent.put(x, x); rank.put(x, 0) }
      while (parent.get(x) != x) {
        val p = parent.get(x)
        parent.put(x, parent.get(p)) // path halving
        x = parent.get(x)
      }
      x
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        val (hi, lo) =
          if (rank.get(ra) >= rank.get(rb)) (ra, rb) else (rb, ra)
        parent.put(lo, hi)
        if (rank.get(ra) == rank.get(rb)) rank.put(hi, rank.get(hi) + 1)
      }
    }
    val minOf = new java.util.HashMap[Long, Long]()
    val docs = parent.keySet().toArray(Array.empty[java.lang.Long]).map(_.longValue())
    docs.foreach { d =>
      val r = find(d)
      if (d < minOf.getOrDefault(r, Long.MaxValue)) minOf.put(r, d)
    }
    docs.map(d => (d, minOf.get(find(d)).longValue()))
  }

  /** Partition count for the dup-edge frame, derived from the measured
    * edge count — the measure-before-spend discipline applied to the
    * propagation loop. Floor 4 (fixture graphs stay tiny and a handful
    * of tasks beats scheduler overhead); ceiling 65536 (a backstop two
    * orders past any real dup graph at 1M rows/partition, not a tuning
    * constant).
    */
  private[graft] def edgePartitions(nEdges: Long, perPartition: Long = 1000000L): Int =
    math.max(4L, math.min(65536L,
      (nEdges + perPartition - 1) / math.max(1L, perPartition))).toInt

  val x2DupClustersSql: String =
    """WITH RECURSIVE sh AS (
      |  SELECT doc_id, list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
      |                                for i in range(1, len(toks) - 1)]) AS s
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |  WHERE len(toks) >= 3
      |), ex AS (SELECT doc_id, unnest(s) AS s FROM sh),
      |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT doc_a, doc_b FROM (
      |    SELECT doc_a, doc_b, c * 1.0 / (sa.n + sb.n - c) AS j
      |    FROM inter JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id)
      |  WHERE j >= 0.8),
      |edges AS (
      |  SELECT doc_a, doc_b FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs),
      |reach AS (
      |  SELECT doc_a AS doc, doc_a AS r FROM edges
      |  UNION
      |  SELECT e.doc_a, reach.r FROM edges e JOIN reach ON reach.doc = e.doc_b)
      |SELECT doc AS doc_id, min(r) AS cluster_rep
      |FROM reach GROUP BY doc ORDER BY doc_id""".stripMargin

  /** X2f' — the dedup MATERIALIZATION: the corpus that survives near-dup
    * removal, i.e. the table a training run actually reads. A document
    * is dropped iff it sits in a dup cluster and is not the cluster's
    * min-id representative; documents in no cluster — including sub-
    * 3-token docs the signing floor exempts — are kept. Built on the
    * LSH-sourced cluster labels ([[x2DupClusters]]): the label table is
    * dup-cluster-sized (orders of magnitude smaller than the corpus), so
    * the final anti-join broadcasts at scale and the corpus is read
    * exactly once here.
    */
  def x2DedupKeep(s: SparkSession, dir: String): DataFrame = {
    val dropped = x2DupClusters(s, dir)
      .filter(col("doc_id") =!= col("cluster_rep"))
      .select(col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("lang"))
      .join(dropped, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }

  /** Oracle twin of [[x2DedupKeep]], derived from [[x2DupClustersSql]]'s
    * own recursive-CTE text (shared prefix — the two cannot drift).
    */
  val x2DedupKeepSql: String = {
    val marker = "SELECT doc AS doc_id, min(r) AS cluster_rep\nFROM reach GROUP BY doc ORDER BY doc_id"
    require(x2DupClustersSql.endsWith(marker), "x2DupClustersSql tail changed")
    x2DupClustersSql.stripSuffix(marker) +
      """,clusters AS (
        |  SELECT doc AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY doc)
        |SELECT d.doc_id, d.source, d.lang FROM documents d
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM clusters WHERE doc_id <> cluster_rep)
        |ORDER BY d.doc_id""".stripMargin
  }

  /** Per-(band, band-hash) bucket population cap for LSH candidate
    * generation (`spark.graft.lsh.bucketCap`; when unset, derived from
    * the corpus size by [[derivedBucketCap]]). See [[cappedSelfPairs]]
    * for the overflow policy.
    */
  private[graft] val BucketCapConf = "spark.graft.lsh.bucketCap"

  /** Fixed-cap form for callers without a measured corpus size (the
    * streaming band store, whose per-batch probe sees only a band slice
    * of the corpus); conf override wins everywhere.
    */
  private[graft] def bucketCap(s: SparkSession): Int =
    s.conf.get(BucketCapConf, "512").toInt

  /** Corpus-size-derived cap for the batch operators — the sizing law
    * extended from [[embeddingGeometry]] to the cap itself. Every batch
    * LSH operator already measures its corpus with one scalar aggregate
    * (the adaptive-collapse probe); that same count sizes the cap, so a
    * fixed constant never has to survive a 100× scale-up.
    */
  private[graft] def bucketCap(s: SparkSession, n: Long): Int =
    s.conf.getOption(BucketCapConf).map(_.toInt).getOrElse(derivedBucketCap(n))

  /** cap(n) = √(2n), clamped to [256, 8192]. A bucket AT the cap
    * generates cap·(cap−1)/2 ≈ n pairs — ONE corpus-linear unit of
    * candidate work — so the hottest surviving bucket can at most add a
    * band's linear volume again, never turn it quadratic; anything
    * hotter is starred to n−1 pairs. The floor keeps fixture-scale
    * buckets (tens of rows at the target 64/bucket embedding geometry)
    * far from the star path, preserving oracle equality; the ceiling
    * bounds the single-bucket verification burst a 100 TB run would
    * pay at ~33M pairs.
    */
  private[graft] def derivedBucketCap(n: Long): Int =
    math.max(256L, math.min(8192L, math.round(math.sqrt(2.0 * math.max(0L, n))))).toInt

  /** Candidate pairs from an exploded (id, band, bh) band table, guarded
    * against hot buckets — the boilerplate-skew killer of LSH at crawl
    * scale: a (band, bh) value collecting n near-identical docs makes the
    * unguarded self-join generate n²/2 rows for that key, quadratic in
    * the hottest bucket.
    *
    * Policy: one cheap (map-side-combinable) population count per bucket,
    * then
    *   - buckets with population ≤ cap: all within-bucket pairs (exact —
    *     the normal path; fixture buckets are orders of magnitude below
    *     the cap, so oracle outputs are unchanged);
    *   - buckets over the cap: a STAR — every member pairs with the
    *     bucket's min id only (n−1 pairs, not n²/2).
    * Overflow is conservative in the admit-more direction only: star
    * pairs are still exactly verified downstream, so no false dup is ever
    * produced; a true pair whose bucket overflowed AND whose smaller side
    * is not the bucket min is missed *in that band* — each of the other
    * 31 bands (a J=0.8 pair collides per band with p≈0.41) independently
    * retains the chance, and in the dominant overflow shape (a
    * boilerplate clique, mutually near-dup) the star keeps every member
    * connected to the representative, which is exactly the greedy
    * min-id dedup outcome. Exact-duplicate skew never reaches this guard
    * at all: callers pre-collapse identical texts first (X1 contract).
    */
  /** ALL ordered colliding pairs of a band frame — the uncapped band
    * self-join. [[cappedSelfPairs]]'s no-overflow fast path; also the
    * only admissible candidate generator where an EXACT oracle twin
    * adjudicates the drop set ([[x2EvictReadmit]]'s in-batch pre-filter,
    * ADVICE r11): the capped path's star-probe under-drops past the
    * bucket cap — fine for admission recall, a silent subset for a
    * hash-exact gate.
    */
  private[graft] def exactSelfPairs(bands: DataFrame, idCol: String,
                                    outA: String, outB: String): DataFrame =
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
          && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as(outA), col(s"b.$idCol").as(outB))
      .distinct()

  private[graft] def cappedSelfPairs(bands: DataFrame, idCol: String, cap: Int,
                                     outA: String, outB: String,
                                     // overflow-branch persist hook: callers with a
                                     // bounded cache scope (the streaming admission
                                     // loop's release-on-exit keep()) pass theirs so
                                     // the cached frame cannot outlive the batch;
                                     // the default routes query paths through the
                                     // harness-released registry
                                     persistFn: DataFrame => DataFrame = Caches.scoped): DataFrame = {
    val stats = bands.groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("__n"), min(col(idCol)).as("__bmin"))
    // adaptive, like the exact pre-collapse: one scalar aggregate over
    // the (already bucket-sized) stats table measures whether ANY bucket
    // overflows. None — every corpus without a boilerplate pileup — keeps
    // the plain one-shuffle self-join; the stats join-back (which the
    // self-join's two sides plus the star branch would each re-execute)
    // is paid only when an overflowing bucket actually exists.
    val maxN = stats.agg(coalesce(max(col("__n")), lit(0L))).head.getLong(0)
    if (maxN <= cap) {
      exactSelfPairs(bands, idCol, outA, outB)
    } else {
      // feeds both self-join sides and the star branch
      val sized = persistFn(bands.join(stats, Seq("band", "bh")))
      val small = sized.filter(col("__n") <= cap)
        .select(col(idCol), col("band"), col("bh"))
      val smallPairs = small.as("a").join(small.as("b"),
          col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
            && col(s"a.$idCol") < col(s"b.$idCol"))
        .select(col(s"a.$idCol").as(outA), col(s"b.$idCol").as(outB))
      val starPairs = sized.filter(col("__n") > cap && col(idCol) =!= col("__bmin"))
        .select(col("__bmin").as(outA), col(idCol).as(outB))
      smallPairs.unionByName(starPairs).distinct()
    }
  }

  /** Permutation budget of [[graft.functions.MinHashSig]]'s signature —
    * the banding geometry must tile inside it.
    */
  private[graft] val MinHashPerms = 128

  /** MinHash banding geometry from the Jaccard recall bound — the
    * [[embeddingGeometry]] sizing law extended to the text family.
    * A pair at Jaccard J collides with one r-row band with J^r and with
    * ≥1 of b bands with 1−(1−J^r)^b; the law picks the LARGEST r (most
    * selective bands — fewest false candidates below the threshold)
    * whose recall-mandated band count b = ⌈ln(miss)/ln(1−J^r)⌉ still
    * tiles the permutation budget (b·r ≤ perms). At the defaults
    * (J=0.8, miss 5e-8, 128 perms) the law lands exactly on 32×4 —
    * the shipped geometry is the law's output, not a free constant:
    * r=5 would demand 43 bands (215 perms, over budget), r=3 would
    * halve selectivity below threshold (0.8³ vs 0.8⁴ per band) for
    * nothing the bound needs.
    */
  private[graft] def minhashGeometry(threshold: Double = 0.8,
                                     missFloor: Double = 5e-8,
                                     perms: Int = MinHashPerms): (Int, Int) = {
    // band counts stay Double until the budget check: a tiny per-band
    // probability demands ~1e13 bands, which .toInt would saturate to
    // Int.MaxValue and bands*r would overflow into "fits"
    val fits = (perms to 1 by -1).iterator.map { r =>
      val perBand = math.pow(threshold, r)
      val bands = math.ceil(math.log(missFloor) / math.log1p(-perBand))
      (bands, r)
    }.find { case (bands, r) => bands >= 1.0 && bands * r <= perms.toDouble }
    fits.map { case (bands, r) => (bands.toInt, r) }.getOrElse((perms, 1))
  }

  private[graft] val (minhashBands, minhashRows) = minhashGeometry()
  require(minhashBands * minhashRows <= MinHashPerms,
    s"banding $minhashBands x $minhashRows exceeds the $MinHashPerms-perm signature")

  /** The banding expression every MinHash consumer (batch LSH,
    * incremental admission, the band store) shares — generated from
    * [[minhashGeometry]]'s (32, 4) so the geometry has exactly one
    * source of truth.
    */
  private[graft] val bandSql =
    s"transform(sequence(0, ${minhashBands - 1}), " +
      s"b -> xxhash64(concat_ws(',', slice(sig, b * $minhashRows + 1, $minhashRows))))"

  /** 128-permutation MinHash signature — the native compiled loop
    * [[graft.functions.MinHashSig]] (one xxhash64 per shingle, 128 fused
    * multiply-add-min passes). The equivalent pure-HOF formulation
    * (transform over permutations × aggregate over shingles) is
    * semantically identical but runs on the interpreted lambda path and
    * profiled ~100× slower at sf0.1 — this is the documented §2.8
    * escalation from built-ins to a custom Expression.
    */
  val minhashSig: Column = graft.functions.MinHashSig(col("sh"))

  /** X2b — MinHash + LSH banding near-dup. 32 bands × 4 rows: a pair with
    * Jaccard J collides in ≥1 band with p = 1-(1-J⁴)³², ≈1-1e-15 at
    * J=0.9. Candidates are verified with exact Jaccard via array
    * intersection (no re-explosion), so the output equals the exact
    * all-pairs query — which is also its oracle.
    *
    * Boilerplate-skew guard (the crawl-corpus scale killer): identical
    * texts are collapsed to their min-doc_id representative BEFORE
    * signing — the X1 exact-dedup ordering `dag_training_prep` runs,
    * here made a contract of the near-dup path itself — so a template
    * repeated k times contributes ONE row per band bucket instead of k
    * (whose unguarded self-join would be k²/2 per band). Distinct-but-
    * near-identical pileups that survive the collapse are bounded by the
    * per-bucket population cap of [[cappedSelfPairs]]. Results are
    * expanded back to doc granularity afterwards: within-group pairs are
    * J=1.0 by construction, and a verified rep pair holds for every
    * member combination (identical text ⇒ identical shingle set), so the
    * output still equals the exact all-pairs oracle while candidate
    * generation stays rep- and cap-bounded.
    *
    * The collapse is engaged ADAPTIVELY: one exact scalar aggregate over
    * the text digest measures whether identical texts exist at all, and
    * a corpus with none (every doc its own representative) takes a lean
    * plan without the collapse/expansion joins — same output, same cap
    * guard, five fewer joins.
    */
  def x2MinHashLsh(s: SparkSession, dir: String): DataFrame =
    x2MinHashLshOf(Tables.documents(s, dir))

  /** Frame-based form of [[x2MinHashLsh]] — the same pipeline over any
    * (doc_id, text) corpus frame, so callers that dedup a SUBSET (the
    * label store's split build, a partition of a larger corpus) reuse
    * the oracle-checked path instead of round-tripping through a dir.
    */
  private[graft] def x2MinHashLshOf(corpus: DataFrame,
                                    preSigned: Option[DataFrame] = None): DataFrame = {
    val s = corpus.sparkSession
    // Spread.byKey before the shingle+sign map (guide §2.5): the fixture
    // corpus scan is one task, so signing serialized on one core; no-op
    // once the scan itself is parallel
    val docs = graft.engine.Spread.byKey(
      corpus
        .filter(size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"), col("text")),
      "doc_id")
    // ADAPTIVE plan choice — the AQE discipline applied at operator
    // level: one exact scalar aggregate (map-side-combinable count /
    // count-distinct over the 8-byte text digest — the same cost class
    // as the groupBy the collapse would run anyway) decides whether
    // exact-duplicate skew EXISTS. Measured zero identical texts ⇒
    // collapse and re-expansion are the identity ⇒ skip their five
    // joins; any identical texts ⇒ pay them. The per-bucket cap guards
    // both plans (it bounds distinct-but-near-identical pileups, which
    // the digest cannot see).
    val shape = docs.agg(count(lit(1)), countDistinct(textKey)).head
    val hasExactDups = shape.getLong(0) != shape.getLong(1)
    // the same measured count sizes the bucket cap — no fixed constant
    val cap = bucketCap(s, shape.getLong(0))

    // signatures feed both band sides and both verification joins —
    // persist so they are computed once (at 100 TB this is the standard
    // "materialize signatures" checkpoint of a MinHash pipeline,
    // storage ~= 1 KB/doc), over representatives only when collapsing.
    // A caller that ALREADY holds the full-corpus signed frame (the
    // label store signs every doc for its index) passes it via
    // `preSigned`: the needed subset is a semi-join of the persisted
    // frame instead of a second shingling+minhash pass — identical
    // values by determinism of both functions over the text
    def signed(d: DataFrame): DataFrame = (preSigned match {
      case Some(pre) => pre.join(d.select(col("doc_id")), Seq("doc_id"), "left_semi")
      case None => d
        .select(col("doc_id"), shingles(col("text")).as("sh"))
        .withColumn("sig", minhashSig)
    }).transform(Caches.scoped)
    // Spread.pairs pins the exact-verify width (guide §2.2): AQE's
    // byte-derived coalescing folds the two-id candidate frame into 1-3
    // tasks and the array_intersect verification serializes on them
    def verify(cand: DataFrame, sig: DataFrame): DataFrame =
      graft.engine.Spread.pairs(cand, "rep_a")
      .join(sig.select(col("doc_id"), col("sh").as("sh_a")), col("rep_a") === col("doc_id")).drop("doc_id")
      .join(sig.select(col("doc_id"), col("sh").as("sh_b")), col("rep_b") === col("doc_id")).drop("doc_id")
      .withColumn("c", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard", round(col("c") / (size(col("sh_a")) + size(col("sh_b")) - col("c")), 6))
      .filter(col("jaccard") >= 0.8)
      .select(col("rep_a"), col("rep_b"), col("jaccard"))

    if (!hasExactDups) {
      // lean plan: every doc is its own representative
      val sig = signed(docs)
      val bands = sig.select(col("doc_id"), posexplode(expr(bandSql)).as(Seq("band", "bh")))
      val cand = cappedSelfPairs(bands, "doc_id", cap, "rep_a", "rep_b")
      // cappedSelfPairs orders every pair (self-join on id <, star from
      // the bucket min), so rep_a < rep_b already holds
      verify(cand, sig)
        .select(col("rep_a").as("doc_a"), col("rep_b").as("doc_b"), col("jaccard"))
        .orderBy("doc_a", "doc_b")
    } else {
      // doc → exact-group key; feeds the collapse, the within-group
      // expansion, and the cross-group expansion
      val memb = Caches.scoped(docs.select(col("doc_id"), textKey.as("th")))
      val reps = memb.groupBy(col("th")).agg(min(col("doc_id")).as("doc_id"))
      val sig = signed(docs.join(reps.select(col("doc_id")), Seq("doc_id"), "left_semi"))
      val bands = sig.select(col("doc_id"), posexplode(expr(bandSql)).as(Seq("band", "bh")))
      val cand = cappedSelfPairs(bands, "doc_id", cap, "rep_a", "rep_b")
      val verified = verify(cand, sig)
      // expansion back to doc granularity. Within-group pairs ARE the
      // true answer for identical texts (J = 1.0) — their count is output
      // size, not candidate work. Cross-group: every member pair of a
      // verified rep pair shares its jaccard (identical text ⇒ identical
      // shingles).
      val withinGroup = memb.as("a").join(memb.as("b"),
          col("a.th") === col("b.th") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          lit(1.0).as("jaccard"))
      val grp = memb.join(reps.withColumnRenamed("doc_id", "rep_id"), Seq("th"))
        .select(col("doc_id"), col("rep_id"))
      val crossGroup = verified
        .join(grp.select(col("rep_id").as("rep_a"), col("doc_id").as("da")), Seq("rep_a"))
        .join(grp.select(col("rep_id").as("rep_b"), col("doc_id").as("db")), Seq("rep_b"))
        .select(least(col("da"), col("db")).as("doc_a"),
          greatest(col("da"), col("db")).as("doc_b"), col("jaccard"))
      withinGroup.unionByName(crossGroup)
        .orderBy("doc_a", "doc_b")
    }
  }

  /** 64-bit SimHash over tokens (with multiplicity): bit k is set when
    * the signed sum of token-hash bit k is positive. Native compiled
    * loop ([[graft.functions.SimHashSig]]) — each token hashed once, all
    * 64 bit counts accumulated in one pass.
    */
  val simhashSig: Column = graft.functions.SimHashSig(split(col("text"), " "))

  /** The pure-HOF formulation of [[simhashSig]] — semantically identical
    * (parity pinned in LlmOpsSpec) but on the interpreted lambda path:
    * 64 boxed passes over the token-hash array per document. Kept as the
    * §2.8 escalation documentation: built-ins first, native Expression
    * only where profiling demands.
    */
  val simhashSigHof: Column = expr(
    """aggregate(array(transform(split(text, ' '), t -> xxhash64(t))), 0L,
      |  (acc0, ths) -> acc0 + aggregate(sequence(0, 63), 0L, (acc, k) ->
      |    acc + if(
      |      aggregate(ths, 0L,
      |        (s, h) -> s + if(shiftright(h, k) % 2 != 0, 1L, -1L)) > 0L,
      |      shiftleft(1L, k), 0L)))""".stripMargin)

  /** X2c — SimHash hamming-distance near-dup, fully self-gated (the
    * `r5_approx_percentiles` discipline: emit the engine-specific value
    * NEXT TO an in-query check the oracle asserts as a literal). Three
    * facts in one row per document:
    *   - `fp`: the PORTABLE 60-bit SimHash built from md5 token hashes
    *     ([[portableFp]]) — DuckDB computes md5 identically, so the
    *     sketch construction (per-token hash → signed bit counts → sign
    *     fingerprint) is hash-checked end to end;
    *   - `native_eq_hof`: the native compiled digest
    *     ([[graft.functions.SimHashSig]]) compared in-query against the
    *     independent interpreted HOF formulation [[simhashSigHof]] of the
    *     same spec — the xxhash64 base can never be portable, so the
    *     native expression is gated against a second in-engine
    *     implementation instead (oracle asserts TRUE);
    *   - `n_near`: partner count at hamming ≤ 3 through 4×15-bit band
    *     buckets over `fp` (≤ 3 differing bits across 4 bands leave ≥ 1
    *     band identical, the pigeonhole guarantee) with exact
    *     bit_count(xor) verification — the banding+verification PAIR
    *     stage, previously rows-only, now hash-checked on the portable
    *     digest. The band join runs over DISTINCT fingerprints with
    *     group counts (see inline comment) so boilerplate corpora cost
    *     one row per template per bucket, not k².
    */
  def x2SimHash(s: SparkSession, dir: String): DataFrame = {
    val fp = Caches.scoped(portableFp(s, dir))
    // the HOF arm of the gate runs on the interpreted lambda path (the
    // documented ~100x-slower twin) — spreading the one-task scan keeps
    // that audit column parallel instead of serial (guide §2.5)
    val gate = graft.engine.Spread.byKey(Tables.documents(s, dir), "doc_id")
      .select(col("doc_id"), (simhashSig === simhashSigHof).as("native_eq_hof"))
    // Boilerplate-skew guard, EXACT form: identical texts have identical
    // fingerprints, so the band self-join runs over DISTINCT fps carrying
    // their group size — a template repeated k times is ONE row per band
    // bucket (the unguarded doc-level join paid k² per bucket) — and the
    // per-doc count is recovered arithmetically: a doc in fp-group G has
    // (|G|−1) hamming-0 partners within its group plus Σ|H| over the
    // distinct fp-groups H within hamming ≤ 3. No approximation: n_near
    // is exactly the doc-level count, only computed at fp granularity.
    val fpg = fp.groupBy(col("fp")).agg(count(lit(1)).as("g"))
    val bands = fpg.select(col("fp"), col("g"),
      posexplode(expr("transform(sequence(0, 3), b -> shiftright(fp, b * 15) % 32768)"))
        .as(Seq("band", "bv")))
    val fpPairs = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv")
          && col("a.fp") =!= col("b.fp"))
      .filter(bit_count(col("a.fp").bitwiseXOR(col("b.fp"))) <= 3)
      // a near pair can collide in up to 3 bands — count each fp-group once
      .select(col("a.fp").as("fp"), col("b.fp").as("pfp"), col("b.g").as("pg"))
      .distinct()
    val crossCnt = fpPairs.groupBy(col("fp")).agg(sum(col("pg")).as("n_cross"))
    fp.join(gate, Seq("doc_id"))
      .join(fpg, Seq("fp"))
      .join(crossCnt, Seq("fp"), "left")
      .select(col("doc_id"), col("fp"), col("native_eq_hof"),
        (col("g") - 1 + coalesce(col("n_cross"), lit(0L))).as("n_near"))
      .orderBy("doc_id")
  }

  val x2SimHashSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |h AS (
      |  SELECT doc_id, CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT) AS hv
      |  FROM tok),
      |bits AS (
      |  SELECT doc_id, b,
      |    CASE WHEN SUM(((hv >> b) & 1) * 2 - 1) > 0 THEN 1 ELSE 0 END AS bit
      |  FROM h CROSS JOIN (SELECT unnest(range(0, 60)) AS b) bs
      |  GROUP BY doc_id, b),
      |fp AS (
      |  SELECT doc_id, CAST(SUM(CAST(bit AS BIGINT) << b) AS BIGINT) AS fp
      |  FROM bits GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, fp, b AS band, (fp >> (b * 15)) % 32768 AS bv
      |  FROM fp CROSS JOIN (SELECT unnest(range(0, 4)) AS b) bs),
      |partners AS (
      |  SELECT DISTINCT a.doc_id, b.doc_id AS partner
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id != b.doc_id
      |  WHERE bit_count(xor(a.fp, b.fp)) <= 3),
      |pc AS (SELECT doc_id, count(*) AS n_near FROM partners GROUP BY doc_id)
      |SELECT fp.doc_id, fp.fp, TRUE AS native_eq_hof,
      |  CAST(COALESCE(pc.n_near, 0) AS BIGINT) AS n_near
      |FROM fp LEFT JOIN pc ON fp.doc_id = pc.doc_id ORDER BY fp.doc_id""".stripMargin

  /** X2c' — portable SimHash fingerprint: the oracle-checkable twin of
    * [[x2SimHash]]'s hash stage. The native path hashes tokens with
    * xxhash64 (engine-specific, so the driver can only row-count it);
    * this form derives a 60-bit fingerprint from md5 — which DuckDB
    * computes identically — putting the SimHash *construction* (per-token
    * hash → signed bit counts → sign fingerprint) under the hash-compare
    * gate. Same strict-majority tie rule as the native expression
    * (bit set iff signed count > 0).
    *
    * The explicit bit explode (×60) is the price of portability; the
    * scale path remains the native [[graft.functions.SimHashSig]] single
    * compiled loop.
    */
  def x2SimHashPortable(s: SparkSession, dir: String): DataFrame =
    portableFp(s, dir).orderBy("doc_id")

  /** Per-doc portable 60-bit SimHash fingerprint (doc_id, fp) — shared by
    * [[x2SimHashPortable]] and the self-gated [[x2SimHash]].
    */
  private def portableFp(s: SparkSession, dir: String): DataFrame = {
    // spread before the token explode + per-token md5 (×60 bit explode
    // follows) — the widest narrow map in the file ran on one task
    val tok = graft.engine.Spread.byKey(Tables.documents(s, dir), "doc_id")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      // 15 hex chars = 60 bits — stays positive in a signed 64-bit long
      // on both engines
      .select(col("doc_id"),
        conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long").as("hv"))
    tok.select(col("doc_id"), col("hv"), explode(sequence(lit(0), lit(59))).as("b"))
      .groupBy(col("doc_id"), col("b"))
      .agg(sum(expr("(shiftright(hv, b) & 1) * 2 - 1")).as("sgn"))
      .withColumn("bit", when(col("sgn") > 0, 1L).otherwise(0L))
      .groupBy(col("doc_id"))
      .agg(sum(expr("shiftleft(bit, b)")).as("fp"))
  }

  val x2SimHashPortableSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |h AS (
      |  SELECT doc_id, CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT) AS hv
      |  FROM tok),
      |bits AS (
      |  SELECT doc_id, b,
      |    CASE WHEN SUM(((hv >> b) & 1) * 2 - 1) > 0 THEN 1 ELSE 0 END AS bit
      |  FROM h CROSS JOIN (SELECT unnest(range(0, 60)) AS b) bs
      |  GROUP BY doc_id, b)
      |SELECT doc_id, CAST(SUM(CAST(bit AS BIGINT) << b) AS BIGINT) AS fp
      |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** X2d — embedding-cosine near-dup: pairs above a cosine threshold.
    * Brute-force form (oracle twin); the scale path shares the LSH
    * bucketing of [[Similarity.x3AnnLsh]].
    */
  def x2EmbeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("norm", sqrt(graft.functions.VectorFunctions.dotF64(col("e"), col("e"))))
    // spread the STREAMED side of the all-pairs product (guide §2.5):
    // the broadcast join leaves the left side at the scan's one-task
    // parallelism, so all n²/2 dot products ran on one core
    graft.engine.Spread.byKey(e, "vec_id").as("a")
      .join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("dot", graft.functions.VectorFunctions.dotF64(col("a.e"), col("b.e")))
      .withColumn("cosine", round(col("dot") / (col("a.norm") * col("b.norm")), 6))
      .filter(col("cosine") >= 0.5)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("cosine"))
      .orderBy("vec_a", "vec_b")
  }

  val x2EmbeddingSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e,
      |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
      |  FROM embeddings)
      |SELECT vec_a, vec_b, cosine FROM (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |    round(list_dot_product(a.e, b.e) / (a.norm * b.norm), 6) AS cosine
      |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
      |WHERE cosine >= 0.5 ORDER BY vec_a, vec_b""".stripMargin

  /** X2d' — the banded-LSH scale path for embedding near-dup: candidate
    * pairs are generated only within random-hyperplane band buckets
    * ([[Similarity.bandedCorpus]], OR across bands of signed-plane rows —
    * the MinHash banding discipline at cosine scale), distinct'd, then
    * exactly verified with the native dot product. The pair-generation
    * shuffle is proportional to per-bucket populations, not n²/2.
    *
    * Round 1 used a single 6-plane cell (all planes must agree): a
    * cosine-0.5 pair collides with probability ≈0.09, and the fixture's
    * one qualifying pair was missed — recall 0. With banding and exact
    * verification the output is a subset of the exact twin — so when
    * every qualifying pair lands in a shared band (verified non-vacuously
    * in LlmOpsSpec, deterministic planes), the output EQUALS the exact
    * all-pairs query, which is also its oracle. At the derived default
    * geometry the analytic ≥1-band collision probability for a
    * threshold-grade pair is ≥ 0.999, and both fixture scales measure
    * full recall (LlmOpsSpec pins equality at sf0.01 and ≥0.9 at sf0.1).
    *
    * On structureless uniform-random data at a cosine-0.5 threshold LSH
    * cannot prune below brute force (unrelated pairs collide in ≥1 band
    * with high probability at any recall-honest geometry) — the fixture
    * runs pay that documented price; on real near-dup corpora
    * (cosine ≥ 0.9) the same law yields narrow buckets and near-linear
    * candidate volume — the regime this operator is the scale path for,
    * measured in STRESS_r7 `embplant`.
    */
  def x2EmbeddingLsh(s: SparkSession, dir: String): DataFrame = {
    // ONE geometry path (VERDICT r7 item 6): the default is derived from
    // the measured corpus size by the same sizing law as the ≥0.9
    // operating regime ([[embeddingGeometry]]), at the fixture's 0.5
    // threshold — planes track log2(n) for constant expected bucket
    // population, bands come from the analytic recall bound (0.999
    // floor), so no caller inherits a fixed geometry that degenerates at
    // 100× the corpus. [[Similarity.LshBands]]×[[Similarity.LshRowsPerBand]]
    // remain the ANN probe's own geometry, no longer reachable here.
    //
    // Round 8: the law also makes the COST-BASED physical choice a query
    // optimizer would ([[lshBeatsBrute]]). At threshold 0.5 every
    // recall-honest geometry passes ≥ 40% of UNRELATED pairs into exact
    // verification (a cosine-0.5 band is barely selective), so banding
    // adds its machinery — n·bands band rows, the bucket self-join,
    // candidate dedup, the vector join-back — on top of near-brute-force
    // verification volume; measured 1,775 s vs tens of seconds for the
    // blocked exact product at n=20k (round-8 stress). The law detects
    // exactly that regime analytically and takes the exact arm; at the
    // ≥0.9 operating threshold the same law keeps the banded arm, where
    // it genuinely prunes (far fraction ≈ 0.05 at n=20k).
    val n = Tables.embeddings(s, dir).count()
    val (nBands, planes) = embeddingGeometry(n, threshold = 0.5)
    if (lshBeatsBrute(nBands, planes)) x2EmbeddingLshAt(s, dir, nBands, planes, 0.5)
    else x2EmbeddingBruteAt(s, dir, 0.5)
  }

  /** Expected fraction of UNRELATED (near-orthogonal) pairs surviving
    * banding at (bands, planes): a random plane splits an orthogonal
    * pair with probability 1/2, so per-band collision is 2^-planes and
    * ≥-1-of-b-bands is 1−(1−2^-planes)^bands. The banded plan's exact-
    * verification work is ~this fraction of the all-pairs product —
    * candidate generation cannot prune below it on structureless data.
    */
  private[graft] def lshFarFraction(nBands: Int, planes: Int): Double =
    1.0 - math.pow(1.0 - math.pow(0.5, planes), nBands)

  /** The banded plan must prune at least 5× of unrelated pairs to pay
    * for its own machinery (band-row explosion, bucket self-join,
    * candidate dedup, vector join-back — ~2–3× the per-pair cost of the
    * inline product); below that the exact blocked product is the
    * faster HONEST plan. The cost-model constant of [[lshBeatsBrute]].
    */
  private[graft] val LshMaxFarFraction = 0.2

  /** The cost-based arm choice of [[x2EmbeddingLsh]] /
    * [[x2EmbeddingLshAuto]], decided analytically from the geometry the
    * sizing law produced — no data scan beyond the corpus count the law
    * already took.
    */
  private[graft] def lshBeatsBrute(nBands: Int, planes: Int): Boolean =
    lshFarFraction(nBands, planes) <= LshMaxFarFraction

  /** The geometry-parameterized form of [[x2EmbeddingLsh]]. The default
    * 6×3 geometry is tuned for the fixtures' cosine-0.5 regime (oracle
    * equality); the near-dup operating regime (cosine ≥ 0.9, the corpus
    * shape this operator is the scale path for) wants NARROWER buckets —
    * 8 bands × 8 planes gives 256 bucket values per band (vs 8 at 3
    * planes), ≥ 1-band collision ≈ 0.99 at cosine 0.95 / 0.93 at 0.9,
    * and per-bucket populations ~n/256 so candidate generation stays
    * near-linear where the 3-plane geometry degenerates quadratic. The
    * planted-near-dup stress (STRESS_r7) measures exactly that path.
    * Candidate generation shares [[cappedSelfPairs]]'s hot-bucket guard.
    */
  private[graft] def x2EmbeddingLshAt(s: SparkSession, dir: String,
                                      nBands: Int, rowsPerBand: Int,
                                      threshold: Double): DataFrame =
    x2EmbeddingPairsAt(s, dir, Some((nBands, rowsPerBand)), threshold)

  /** The exact arm of the [[lshBeatsBrute]] crossover: the blocked
    * all-pairs product with the dot computed INLINE in the join (no
    * candidate shuffle, no vector join-back — at brute volume those
    * dominate), sharing the adaptive identical-vector collapse with the
    * banded arm so a k-copy pileup costs (n/k)², not n². The corpus side
    * broadcasts when the measured count is bounded
    * ([[BruteBroadcastMaxRows]]) — each task then streams its partition
    * against the in-memory corpus; past the bound Spark's cartesian
    * product keeps partition×partition parallelism. Output equals the
    * exact twin by construction (it IS the exact computation).
    */
  private[graft] def x2EmbeddingBruteAt(s: SparkSession, dir: String,
                                        threshold: Double): DataFrame =
    x2EmbeddingPairsAt(s, dir, None, threshold)

  /** ~1 KB/vector at 128 dims → ≤ ~100 MB broadcast at the bound. */
  private[graft] val BruteBroadcastMaxRows = 100000L

  private def x2EmbeddingPairsAt(s: SparkSession, dir: String,
                                 geometry: Option[(Int, Int)],
                                 threshold: Double): DataFrame = {
    // 128-bit identical-vector group key (the textKey discipline carried
    // into vector space: boilerplate docs produce byte-identical
    // embeddings, the same pileup shape)
    val vecKey = struct(xxhash64(col("e")).as("h1"),
      xxhash64(lit(0x9E3779B97F4A7C15L), col("e")).as("h2"))
    val e0 = Similarity.normed(s, dir)
    // adaptive, as in x2MinHashLsh: pay the collapse/expansion only when
    // identical vectors are measured to exist
    val shape = e0.agg(count(lit(1)), countDistinct(vecKey)).head
    val hasDupVecs = shape.getLong(0) != shape.getLong(1)
    // the same measured count sizes the bucket cap — no fixed constant
    val cap = bucketCap(s, shape.getLong(0))

    // the corpus frame feeds both candidate sides and both verification
    // joins — persist so signatures are computed once; (vec_id, e, norm)
    // on both arms, plus the band array on the banded arm
    def corpusOf(): DataFrame = geometry match {
      case Some((b, p)) => Similarity.bandedCorpus(s, dir, b, p)
      case None         => Similarity.normed(s, dir)
    }
    def pairsOver(e: DataFrame, outA: String, outB: String): DataFrame = geometry match {
      case Some(_) =>
        val bb = e.select(col("vec_id"), posexplode(col("bands")).as(Seq("band", "bh")))
        val cand = cappedSelfPairs(bb, "vec_id", cap, outA, outB)
        cand
          .join(e.select(col("vec_id").as(outA), col("e").as("ea"), col("norm").as("na")), Seq(outA))
          .join(e.select(col("vec_id").as(outB), col("e").as("eb"), col("norm").as("nb")), Seq(outB))
          .withColumn("dot", graft.functions.VectorFunctions.dotF64(col("ea"), col("eb")))
          .withColumn("cosine", round(col("dot") / (col("na") * col("nb")), 6))
          .filter(col("cosine") >= threshold)
          .select(col(outA), col(outB), col("cosine"))
      case None =>
        val right = e.select(col("vec_id").as(outB), col("e").as("eb"), col("norm").as("nb"))
        val hinted = if (shape.getLong(0) <= BruteBroadcastMaxRows) broadcast(right) else right
        // spread the streamed side (the x2EmbeddingNearDup note): the
        // brute product's dots otherwise run at the cache's one-task
        // parallelism
        graft.engine.Spread.byKey(
            e.select(col("vec_id").as(outA), col("e").as("ea"), col("norm").as("na")),
            outA)
          .join(hinted, col(outA) < col(outB))
          .withColumn("cosine", round(
            graft.functions.VectorFunctions.dotF64(col("ea"), col("eb")) /
              (col("na") * col("nb")), 6))
          .filter(col("cosine") >= threshold)
          .select(col(outA), col(outB), col("cosine"))
    }

    if (!hasDupVecs) {
      val e = Caches.scoped(corpusOf())
      pairsOver(e, "vec_a", "vec_b").orderBy("vec_a", "vec_b")
    } else {
      // collapse to min-vec_id representatives: identical vectors share
      // every cosine and every band, so a verified rep pair holds for all
      // member combinations, a within-group pair's cosine is the rep's
      // self-cosine (computed through the SAME rounded arithmetic as the
      // exact twin, not synthesized as a literal), and a rep pair missed
      // by banding would have been missed at doc granularity too — the
      // subset-of-exact contract is preserved while a k-copy template
      // costs one row per band bucket instead of k²
      val memb = Caches.scoped(e0.select(col("vec_id"), vecKey.as("vk")))
      val reps = memb.groupBy(col("vk")).agg(min(col("vec_id")).as("vec_id"))
      val e = Caches.scoped(corpusOf()
        .join(reps.select(col("vec_id")), Seq("vec_id"), "left_semi"))
      val verified = pairsOver(e, "rep_a", "rep_b")
      val grp = memb.join(reps.select(col("vk"), col("vec_id").as("rep_id")), Seq("vk"))
        .select(col("vec_id"), col("rep_id"))
      val selfCos = e.select(col("vec_id").as("rep_id"),
        round(graft.functions.VectorFunctions.dotF64(col("e"), col("e")) /
          (col("norm") * col("norm")), 6).as("cosine"))
      val withinGroup = grp.as("a").join(grp.as("b"),
          col("a.rep_id") === col("b.rep_id") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          col("a.rep_id").as("rep_id"))
        .join(selfCos, Seq("rep_id"))
        .filter(col("cosine") >= threshold)
        .select(col("vec_a"), col("vec_b"), col("cosine"))
      val crossGroup = verified
        .join(grp.select(col("rep_id").as("rep_a"), col("vec_id").as("va")), Seq("rep_a"))
        .join(grp.select(col("rep_id").as("rep_b"), col("vec_id").as("vb")), Seq("rep_b"))
        .select(least(col("va"), col("vb")).as("vec_a"),
          greatest(col("va"), col("vb")).as("vec_b"), col("cosine"))
      withinGroup.unionByName(crossGroup).orderBy("vec_a", "vec_b")
    }
  }

  /** X2d'' — [[x2EmbeddingLsh]] with the banding geometry DERIVED from
    * the corpus size instead of read from constants — the 100 TB sizing
    * rule made code. The fixed fixture geometry (6×3: 8 bucket values
    * per band) keeps oracle equality at the cosine-0.5 fixture regime
    * but degenerates as n grows: expected bucket population is n/2^p,
    * so a geometry that was sparse at 2k vectors is a pileup at 2M and
    * every bucket overflows the cap at 20M (the measured STRESS_r7
    * `x2_embedding_lsh` ×10 artifact). Here p (planes per band) grows
    * with log2(n) to hold the expected bucket population at a constant
    * target, and the band count is derived from the analytic recall
    * bound at the near-dup operating threshold (cosine 0.9) — so the
    * SAME call is correctly sized at every corpus scale, which is the
    * property a 100 TB deployment actually needs. The per-bucket cap
    * ([[cappedSelfPairs]]) stays as the backstop for residual skew
    * (identical-vector pileups are collapsed first, as in
    * [[x2EmbeddingLshAt]]).
    *
    * On the structureless fixtures the ≥0.9 answer is empty (max
    * pairwise cosine ≈ 0.51) — the oracle twin pins exactly that (no
    * false positives); the positive path (planted cosine-0.995 twins
    * found in full at auto geometry) is pinned in Round7Spec.
    */
  def x2EmbeddingLshAuto(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.embeddings(s, dir).count()
    val (nBands, planes) = embeddingGeometry(n)
    // the same cost-based arm choice as x2EmbeddingLsh: at small n the
    // ≥0.9 geometry is still too coarse to prune 5× (far fraction 0.44
    // at 9×4), so the exact product is the faster honest plan; from
    // n ≈ 10k upward the law's own geometry clears the bar and the
    // banded arm engages (far fraction ≈ 0.05 at 25×9) — brute at small
    // corpora, LSH at scale, decided analytically per corpus.
    if (lshBeatsBrute(nBands, planes)) x2EmbeddingLshAt(s, dir, nBands, planes, 0.9)
    else x2EmbeddingBruteAt(s, dir, 0.9)
  }

  /** Banding geometry from corpus size. Planes per band p =
    * log2(n / targetBucketPop), clamped to [4, 12] (12 planes = 4096
    * bucket values per band, enough to hold the target population up to
    * n ≈ 2.6e5 per PARTITION-of-the-keyspace; past the clamp the
    * per-bucket cap carries the residual). Bands b from the recall
    * bound: a cosine-c pair agrees with one plane with probability
    * 1 − acos(c)/π, with a whole band with that to the p-th power, and
    * with ≥1 of b bands with 1 − (1−perBand)^b — solve for b at the
    * floor. Raising n 100× adds ~6.6 planes and the bands the flatter
    * per-band probability demands; candidate volume per vector stays
    * ~bands × targetBucketPop instead of growing linearly with n.
    */
  private[graft] def embeddingGeometry(n: Long, threshold: Double = 0.9,
                                       recallFloor: Double = 0.999,
                                       targetBucketPop: Int = 64): (Int, Int) = {
    val planes = math.min(12, math.max(4,
      math.ceil(math.log(math.max(2.0, n.toDouble / targetBucketPop)) / math.log(2.0)).toInt))
    val perPlane = 1.0 - math.acos(threshold) / math.Pi
    val perBand = math.pow(perPlane, planes)
    val nBands = math.max(4, math.ceil(math.log1p(-recallFloor) / math.log1p(-perBand)).toInt)
    (nBands, planes)
  }

  val x2EmbeddingAutoSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e,
      |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
      |  FROM embeddings)
      |SELECT vec_a, vec_b, cosine FROM (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |    round(list_dot_product(a.e, b.e) / (a.norm * b.norm), 6) AS cosine
      |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
      |WHERE cosine >= 0.9 ORDER BY vec_a, vec_b""".stripMargin

  /** X2g — INCREMENTAL near-dup admission: a new batch of documents
    * (doc_id % 5 == 0, 20% of the corpus at every SF) is admitted against
    * the already-ingested corpus (the other 80%); a batch doc is dropped
    * when MinHash-LSH banding + exact verification finds a corpus
    * near-dup at Jaccard ≥ 0.8.
    *
    * This is the production dedup loop at 100 TB — dedup never re-runs
    * over the whole corpus when data arrives: the corpus's 128-perm
    * signatures and (band, band-hash) table are PRECOMPUTED state
    * (~1 KB/doc, bucketed by band hash); a batch computes signatures for
    * its own docs only (narrow map), probes the band store with a
    * candidate join co-located on the bucket, exactly verifies the
    * candidates, and the admitted survivors' bands are appended to the
    * store. Per-batch cost scales with the batch and its candidate
    * pairs; the corpus text is never re-scanned and nothing is ever
    * all-pairs. (Batch-internal duplicates are the SAME mechanism applied
    * within the batch — [[x2MinHashLsh]] restricted to it — kept out of
    * this query so the admission semantics stay single-purpose.)
    *
    * Oracle: exact all-pairs batch×corpus Jaccard (the quadratic DuckDB
    * twin). At 32 bands × 4 rows a J=0.8 pair collides in ≥1 band with
    * p = 1-(1-0.8⁴)³² ≈ 1-3e-9, so LSH+verify equals exact — the same
    * discipline that makes `x2_minhash_lsh` hash-checkable.
    *
    * Skew guard, mirroring [[graft.streaming.BandStore.admitBatch]]:
    * each side is exact-collapsed to min-id representatives SEPARATELY
    * (collapsing across the batch/corpus split would move a doc's probe
    * to the wrong side), the corpus side of each (band, bh) bucket is
    * capped with the star-probe overflow, and a batch member's fate is
    * its representative's fate (identical text ⇒ identical corpus
    * near-dup relations), re-expanded through the group table at the
    * end. On boilerplate corpora candidate generation is rep- and
    * cap-bounded; on the fixtures (no identical texts) every doc is its
    * own rep and the output is byte-identical to the unguarded form —
    * and the collapse engages ADAPTIVELY (measured count vs
    * count-distinct of (digest, side), as in [[x2MinHashLsh]]), so the
    * no-dup case also skips the collapse/expansion joins, not just
    * their effect.
    */
  def x2IncrementalLsh(s: SparkSession, dir: String): DataFrame = {
    // spread before the shingle+sign map (guide §2.5, the
    // x2MinHashLshOf note)
    val docs = graft.engine.Spread.byKey(
      Tables.documents(s, dir)
        .filter(size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"), col("text")),
      "doc_id")
    // per-side exact pre-collapse (X1 first — the dag_training_prep
    // ordering): group key = 8-byte text digest
    val memb = Caches.scoped(docs.select(col("doc_id"), textKey.as("th"),
      (col("doc_id") % 5 === 0).as("is_batch")))
    // adaptive, as in x2MinHashLsh: measure whether any (text, side)
    // group holds more than one doc; if not, the collapse semi-join and
    // the group re-expansion are identities and are skipped (memb stays
    // unevaluated on that path). The corpus-side bucket cap below guards
    // both plans.
    val shape = docs.agg(count(lit(1)),
      countDistinct(textKey, col("doc_id") % 5 === 0)).head
    val hasExactDups = shape.getLong(0) != shape.getLong(1)
    // the same measured count sizes the bucket cap — no fixed constant
    val cap = bucketCap(s, shape.getLong(0))
    val reps = memb.groupBy(col("th"), col("is_batch"))
      .agg(min(col("doc_id")).as("doc_id"))
    // signatures feed the band probe and the verification joins — persist
    // (in production: read the corpus side from the signature store);
    // representatives only when collapsing
    val signable =
      if (hasExactDups) docs.join(reps.select(col("doc_id")), Seq("doc_id"), "left_semi")
      else docs
    val sig = signable
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .withColumn("sig", minhashSig)
      .transform(Caches.scoped)
    def bandsOf(df: DataFrame, idAs: String): DataFrame =
      df.select(col("doc_id").as(idAs), posexplode(expr(bandSql)).as(Seq("band", "bh")))
    val corpus = sig.filter(col("doc_id") % 5 =!= 0)
    val batch  = sig.filter(col("doc_id") % 5 === 0)
    // corpus-side bucket cap (star-probe on overflow — under-drops only,
    // every candidate still exactly verified; see admitBatch). Adaptive
    // like cappedSelfPairs: the filter join over the full corpus band
    // table is paid only when a bucket actually overflows.
    val corpusBands = bandsOf(corpus, "corpus_id")
    val stats = corpusBands.groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("__n"), min(col("corpus_id")).as("__cmin"))
    val maxBucket = stats.agg(coalesce(max(col("__n")), lit(0L))).head.getLong(0)
    val guardedCorpus =
      if (maxBucket <= cap) corpusBands
      else corpusBands
        .join(stats.filter(col("__n") <= cap).select(col("band"), col("bh")), Seq("band", "bh"))
        .unionByName(stats.filter(col("__n") > cap)
          .select(col("band"), col("bh"), col("__cmin").as("corpus_id")))
    val cand = bandsOf(batch, "batch_id")
      .join(guardedCorpus, Seq("band", "bh"))
      .select(col("batch_id"), col("corpus_id"))
      .distinct()
    // Spread.pairs pins the exact-verify width (guide §2.2; see
    // x2MinHashLshOf's verify)
    val droppedReps = graft.engine.Spread.pairs(cand, "batch_id")
      .join(batch.select(col("doc_id"), col("sh").as("sh_b")), col("batch_id") === col("doc_id")).drop("doc_id")
      .join(corpus.select(col("doc_id"), col("sh").as("sh_c")), col("corpus_id") === col("doc_id")).drop("doc_id")
      .withColumn("c", size(array_intersect(col("sh_b"), col("sh_c"))).cast("double"))
      .filter(round(col("c") / (size(col("sh_b")) + size(col("sh_c")) - col("c")), 6) >= 0.8)
      .select(col("batch_id").as("rep_id"))
      .distinct()
    // a batch member shares its representative's fate: expand dropped
    // reps to every member of their exact group (identity when no side
    // holds identical texts — skipped on the lean plan)
    val dropped = if (hasExactDups) {
      val batchGroups = memb.filter(col("is_batch"))
        .join(reps.filter(col("is_batch")).select(col("th"), col("doc_id").as("rep_id")), Seq("th"))
        .select(col("doc_id"), col("rep_id"))
      batchGroups.join(droppedReps, Seq("rep_id"))
        .select(col("doc_id")).distinct()
    } else droppedReps.select(col("rep_id").as("doc_id"))
    // admit from the full batch (docs under 3 tokens have no shingles and
    // are admitted by construction)
    Tables.documents(s, dir).filter(col("doc_id") % 5 === 0)
      .join(dropped, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** X2h [EXT] — the RETENTION lifecycle of the admission store under
    * the hash gate: seed the band store from the non-batch corpus
    * verbatim ([[graft.streaming.BandStore.importCorpus]] — the
    * adopt-in-place bootstrap), EVICT every 7th corpus doc
    * ([[graft.streaming.BandStore.evictDocs]] — a takedown/TTL batch),
    * then admit the batch split through the REAL
    * [[graft.streaming.BandStore.admitBatch]] machinery. An evicted
    * doc must stop vetoing (its near-dups in the batch are admitted);
    * every retained doc must keep vetoing. Oracle: exact all-pairs
    * batch × LIVE-corpus Jaccard — `x2_incremental`'s quadratic twin
    * with the evicted ids removed from the peer set.
    *
    * The batch is pre-filtered to be in-batch-dup-free (BOTH sides of
    * every within-batch J ≥ 0.8 pair drop): with no within-batch pairs
    * the greedy min-id admission fixpoint is the identity, so the
    * DuckDB twin stays non-recursive. The same symmetric filter is
    * expressed in the twin SQL. The filter is built from the store's
    * own canonical signing ([[graft.streaming.BandStore.signDocs]] /
    * `explodeBands` — a hand-inlined copy could silently diverge from
    * the pipeline under test); skew is handled by the adaptive exact
    * pre-collapse to min-id representatives (a multi-member exact group
    * is pairwise J=1, so the WHOLE group drops and only its rep joins
    * the pair scan), and the pair scan itself is the EXACT band
    * self-join, not the capped one — the twin's drop set is exact
    * all-pairs, and a bucket past the cap would silently shrink the
    * Spark-side drops below it (ADVICE r11). Both-sides-drop commutes
    * with the collapse: a singleton near-dup of a group's text pairs
    * with the group's rep.
    */
  def x2EvictReadmit(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.BandStore
    // the seeded+evicted store is this lane's BASE state, not its timed
    // work: production admission bootstraps its corpus once and admits
    // batches forever after, so re-importing + re-evicting per
    // invocation benched a verification twin's cost, not the admission
    // loop's — exactly the VERDICT r14 #5 / r15 #1 argument that moved
    // the label lanes onto [[StoreDirs.cachedBaseStore]] (built once per
    // JVM, file-copied per invocation). Correctness untouched: the first
    // call still builds genuinely from scratch (the cold pass-1 sample
    // records that cost), the copy is byte-identical, and the oracle
    // hash-checks every invocation's full admission output.
    val base = graft.operators.StoreDirs.cachedBaseStore(s"evict:$dir") { st =>
      val corpus = Tables.documents(s, dir).filter(col("doc_id") % 5 =!= 0)
      BandStore.importCorpus(corpus, 0L, st)
      BandStore.evictDocs(
        corpus.filter(col("doc_id") % 7 === 0).select(col("doc_id")), 1L, st)
    }
    graft.operators.StoreDirs.withTempStore("graft-evict") { store =>
      graft.operators.StoreDirs.copyStore(s, base, store)
      val persisted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      def keep(df: DataFrame): DataFrame = { persisted += df; df.persist() }
      val docs = Tables.documents(s, dir)
      try {
        val batch0 = docs.filter(col("doc_id") % 5 === 0)
        val signable = keep(batch0.filter(size(split(col("text"), " ")) >= 3)
          .select(col("doc_id"), textKey.as("__th")))
        val shape = signable.agg(count(lit(1)), countDistinct(col("__th"))).head
        val hasExactDups = shape.getLong(0) != shape.getLong(1)
        val (repDocs, multiMembers) =
          if (!hasExactDups) (batch0, s.range(0).select(col("id").as("doc_id")))
          else {
            val groups = signable.groupBy(col("__th"))
              .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("__n"))
            val multi = keep(signable
              .join(groups.filter(col("__n") > 1).select(col("__th")), Seq("__th"))
              .select(col("doc_id")))
            (batch0.join(groups.select(col("rep_id").as("doc_id")),
              Seq("doc_id"), "left_semi"), multi)
          }
        val sig = keep(BandStore.signDocs(repDocs))
        // keep()-materialized (ADVICE r13): the sanity aggregate below
        // plus the self-join's two sides would otherwise each re-explode
        // the bands from the cached sig — three scans for one frame. One
        // cached explode serves all three; the aggregate itself stays
        // EAGER by design: this builder is eager end-to-end (it runs
        // store admission in-line), and the bound exists to fail loudly
        // BEFORE the quadratic join, not after.
        val bands = keep(BandStore.explodeBands(sig, "doc_id"))
        // EXACT pairs, not cappedSelfPairs (ADVICE r11): the DuckDB twin
        // computes the in-batch drop set by exact all-pairs Jaccard, so a
        // hot band bucket past the cap would make the Spark-side drops a
        // strict SUBSET of the twin's and silently diverge the hash gate.
        // The batch split is small (a fifth of the corpus, exact-
        // pre-collapsed above), so the uncapped self-join is bounded —
        // but only probabilistically: k DISTINCT near-identical texts in
        // one (band, bh) bucket survive the exact pre-collapse and
        // generate O(k²) pairs with no cap. A documented
        // correctness-over-cost trade for this oracle-gated query; the
        // loud sanity bound below (ADVICE r12) turns a pathological
        // fixture into a diagnosis instead of a quadratic hang. At the
        // bound, one bucket contributes ~8M candidate pairs — far past
        // any sane fixture, still minutes not hours if ever hit.
        val sanityCap = math.max(4096, 8 * bucketCap(s))
        val hottest = bands.groupBy(col("band"), col("bh"))
          .agg(count(lit(1)).as("__n"))
          .agg(coalesce(max(col("__n")), lit(0L))).head.getLong(0)
        if (hottest > sanityCap) throw new IllegalStateException(
          s"x2EvictReadmit in-batch pre-filter: a band bucket holds $hottest distinct " +
            s"near-identical docs (> sanity bound $sanityCap) — the EXACT all-pairs " +
            "scan its oracle twin mandates would go quadratic on it. The fixture is " +
            "pathologically boilerplate-skewed; use the capped admission path for " +
            "production corpora of this shape.")
        // spread the CPU-dense exact verify (guide §2.2 via Spread.pairs):
        // AQE coalesced the candidate frame to 2 post-shuffle tasks and
        // the array_intersect verify ran 3.7 s serially on them
        val cand = graft.engine.Spread.pairs(
          exactSelfPairs(bands, "doc_id", "a_id", "b_id"), "a_id")
        val dupPairs = cand
          .join(sig.select(col("doc_id").as("a_id"), col("sh").as("sh_a")), Seq("a_id"))
          .join(sig.select(col("doc_id").as("b_id"), col("sh").as("sh_b")), Seq("b_id"))
          .withColumn("c", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
          .filter(round(col("c") / (size(col("sh_a")) + size(col("sh_b")) - col("c")), 6) >= 0.8)
        val inBatchDropped = dupPairs.select(col("a_id").as("doc_id"))
          .unionByName(dupPairs.select(col("b_id").as("doc_id")))
          .unionByName(multiMembers)
          .distinct()
        val batch = batch0.join(inBatchDropped, Seq("doc_id"), "left_anti")
          .localCheckpoint()
        try {
          val admitted = s"$store-admitted"
          BandStore.admitBatch(batch, 2L, store, admitted)
          s.read.parquet(admitted)
            .select(col("doc_id"), col("source"), col("n_chars"))
            .orderBy("doc_id")
            .localCheckpoint()
        } finally graft.operators.StoreDirs.freePinned(batch)
      } finally persisted.foreach(_.unpersist())
    }
  }

  /** X7 [EXT] — benchmark DECONTAMINATION: flag training-split documents
    * that share any 8-token shingle with an evaluation-split document
    * (the n-gram-overlap rule used to scrub eval leakage from training
    * corpora). The split is the same md5 bucketing as `x6_hash_split`
    * (train < 96, eval ≥ 96), so the check composes with the split it
    * protects.
    *
    * Scale shape: shingles are hashed per doc (narrow map, distinct
    * within doc), and the overlap join keys on the 8-byte shingle hash.
    * A 64-bit collision can only OVER-flag (a clean train doc matches an
    * eval shingle it doesn't contain) — the conservative direction for
    * decontamination; the expected count stays single-digit even at
    * 10¹³ train × 10⁷ eval shingles.
    * At 100 TB the eval side is a benchmark suite — megabytes — so its
    * shingle set BROADCASTS and the train side never shuffles at all;
    * at fixture scale both sides are corpus splits and the join
    * shuffles on the hash. Output counts are per flagged train doc
    * (shared distinct shingles + distinct eval docs hit).
    */
  def x7Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    // spread before the 8-gram hash explode (guide §2.5): the serial
    // one-task shingle map was the single largest span in the
    // dag_corpus_build profile (1.5 s writing 9 MB of shuffle from one
    // task at sf0.1)
    val sh = graft.engine.Spread.byKey(
        Tables.documents(s, dir)
          .withColumn("bucket",
            conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10).cast("long") % 100)
          .filter(size(toks) >= 8),
        "doc_id")
      .select(col("doc_id"), col("bucket"),
        explode(graft.functions.NGramHashes(toks, 8)).as("sh"))
    val train = sh.filter(col("bucket") < 96).select(col("doc_id").as("train_id"), col("sh"))
    val eval_ = sh.filter(col("bucket") >= 96).select(col("doc_id").as("eval_id"), col("sh"))
    train.join(eval_, Seq("sh"))
      .groupBy(col("train_id"))
      .agg(countDistinct(col("sh")).as("n_shared"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
      .orderBy("train_id")
  }

  val x7DecontaminateSql: String =
    """WITH b AS (
      |  SELECT doc_id, text,
      |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 AS bucket
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, bucket,
      |    unnest(list_distinct([array_to_string(toks[i:i+7], ' ')
      |                          for i in range(1, len(toks) - 6)])) AS s
      |  FROM (SELECT doc_id, bucket, string_split(text, ' ') AS toks FROM b)
      |  WHERE len(toks) >= 8)
      |SELECT t.doc_id AS train_id, count(DISTINCT t.s) AS n_shared,
      |  count(DISTINCT e.doc_id) AS n_eval_docs
      |FROM sh t JOIN sh e ON t.s = e.s AND t.bucket < 96 AND e.bucket >= 96
      |GROUP BY t.doc_id ORDER BY train_id""".stripMargin

  /** X7' — the decontamination MATERIALIZATION, completing X7 the way
    * [[x2DedupKeep]] completes X2: the train split minus every doc that
    * shares an 8-gram with the eval split — the corpus a training run
    * reads after decontamination. Train docs under the 8-token shingle
    * floor carry no shingles, cannot be contaminated, and are kept.
    * Scale shape: the contaminated id list is a small fraction of the
    * corpus (it is bounded by the eval overlap), so the final anti-join
    * broadcasts; the overlap join itself is the [[x7Decontaminate]]
    * plan, eval side broadcastable.
    */
  def x7DecontamKeep(s: SparkSession, dir: String): DataFrame = {
    val contaminated = x7Decontaminate(s, dir)
      .select(col("train_id").as("doc_id"))
    Tables.documents(s, dir)
      .withColumn("bucket",
        conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10).cast("long") % 100)
      .filter(col("bucket") < 96)
      .select(col("doc_id"), col("source"), col("lang"))
      .join(contaminated, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }

  /** Keep the shingle/bucket CTEs textually in sync with
    * [[x7DecontaminateSql]] (shared prefix — derived, cannot drift).
    */
  val x7DecontamKeepSql: String = {
    val marker = "SELECT t.doc_id AS train_id, count(DISTINCT t.s) AS n_shared,\n  count(DISTINCT e.doc_id) AS n_eval_docs\nFROM sh t JOIN sh e ON t.s = e.s AND t.bucket < 96 AND e.bucket >= 96\nGROUP BY t.doc_id ORDER BY train_id"
    require(x7DecontaminateSql.endsWith(marker), "x7DecontaminateSql tail changed")
    x7DecontaminateSql.stripSuffix(marker) +
      """,contaminated AS (
        |  SELECT DISTINCT t.doc_id
        |  FROM sh t JOIN sh e ON t.s = e.s AND t.bucket < 96 AND e.bucket >= 96)
        |SELECT d.doc_id, d.source, d.lang
        |FROM documents d JOIN b ON d.doc_id = b.doc_id
        |WHERE b.bucket < 96
        |  AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
        |ORDER BY d.doc_id""".stripMargin
  }

  val x2IncrementalSql: String =
    """WITH sh AS (
      |  SELECT doc_id, list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
      |                                for i in range(1, len(toks) - 1)]) AS s
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |  WHERE len(toks) >= 3
      |), ex AS (SELECT doc_id, unnest(s) AS s FROM sh),
      |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
      |inter AS (
      |  SELECT b.doc_id AS batch_id, a.doc_id AS corpus_id, count(*) AS c
      |  FROM ex a JOIN ex b ON a.s = b.s
      |  WHERE a.doc_id % 5 != 0 AND b.doc_id % 5 = 0
      |  GROUP BY 1, 2),
      |dropped AS (
      |  SELECT DISTINCT batch_id FROM (
      |    SELECT batch_id, round(c * 1.0 / (sc.n + sb.n - c), 6) AS j
      |    FROM inter JOIN sizes sc ON corpus_id = sc.doc_id
      |               JOIN sizes sb ON batch_id = sb.doc_id)
      |  WHERE j >= 0.8)
      |SELECT doc_id, source, n_chars FROM documents
      |WHERE doc_id % 5 = 0 AND doc_id NOT IN (SELECT batch_id FROM dropped)
      |ORDER BY doc_id""".stripMargin

  /** DuckDB twin of [[x2EvictReadmit]]: the incremental twin with (a)
    * the evicted ids (`% 7 = 0`) removed from the corpus peer set and
    * (b) the symmetric within-batch near-dup filter — both sides of
    * every batch-internal J ≥ 0.8 pair leave the batch, exactly the
    * pre-filter the Spark side applies before admission.
    */
  val x2EvictReadmitSql: String =
    """WITH sh AS (
      |  SELECT doc_id, list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
      |                                for i in range(1, len(toks) - 1)]) AS s
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |  WHERE len(toks) >= 3
      |), ex AS (SELECT doc_id, unnest(s) AS s FROM sh),
      |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
      |binter AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
      |  FROM ex a JOIN ex b ON a.s = b.s
      |  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 = 0 AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |bpairs AS (
      |  SELECT a_id, b_id FROM (
      |    SELECT a_id, b_id, round(c * 1.0 / (sa.n + sb.n - c), 6) AS j
      |    FROM binter JOIN sizes sa ON a_id = sa.doc_id
      |                JOIN sizes sb ON b_id = sb.doc_id)
      |  WHERE j >= 0.8),
      |bdrop AS (
      |  SELECT DISTINCT doc_id FROM (
      |    SELECT a_id AS doc_id FROM bpairs
      |    UNION ALL SELECT b_id AS doc_id FROM bpairs)),
      |inter AS (
      |  SELECT b.doc_id AS batch_id, a.doc_id AS corpus_id, count(*) AS c
      |  FROM ex a JOIN ex b ON a.s = b.s
      |  WHERE a.doc_id % 5 != 0 AND a.doc_id % 7 != 0 AND b.doc_id % 5 = 0
      |  GROUP BY 1, 2),
      |sdrop AS (
      |  SELECT DISTINCT batch_id FROM (
      |    SELECT batch_id, round(c * 1.0 / (sc.n + sb.n - c), 6) AS j
      |    FROM inter JOIN sizes sc ON corpus_id = sc.doc_id
      |               JOIN sizes sb ON batch_id = sb.doc_id)
      |  WHERE j >= 0.8)
      |SELECT doc_id, source, n_chars FROM documents
      |WHERE doc_id % 5 = 0
      |  AND doc_id NOT IN (SELECT doc_id FROM bdrop)
      |  AND doc_id NOT IN (SELECT batch_id FROM sdrop)
      |ORDER BY doc_id""".stripMargin
}
