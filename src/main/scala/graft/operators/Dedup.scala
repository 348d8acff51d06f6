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
    Tables.documents(s, dir)
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), shingles(col("text")).as("sh"))

  /** X2a — exact all-pairs n-gram Jaccard near-dup (the oracle-checkable
    * form; quadratic in the worst case, so it is the verification twin,
    * not the scale path).
    */
  def x2Jaccard(s: SparkSession, dir: String): DataFrame = {
    // shingling feeds both self-join sides plus the two size lookups —
    // persist so the transform runs once per doc, not four times
    val ds = docShingles(s, dir).persist()
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
    * Each iteration is one distributed join+min-aggregate and propagates
    * labels one hop, so k iterations cover diameter ≤ k (fixture
    * components are ≤ 3 nodes; k = 4 leaves slack ×2). At 100 TB the
    * same loop runs O(log n) iterations with the large-star/small-star
    * optimization and a checkpoint every few rounds to cut lineage —
    * the driver-side `for` is iteration control, not data movement.
    * Oracle: DuckDB recursive CTE computing min-reachable per doc.
    */
  def x2DupClusters(s: SparkSession, dir: String): DataFrame = {
    // pairs come from the LSH SCALE path, not the quadratic all-pairs
    // twin — banding + exact verification yields the identical pair set
    // (that equality is x2_minhash_lsh's own oracle), so the cluster
    // result is unchanged while the pair stage stays candidate-bounded
    val pairs = x2MinHashLsh(s, dir).select(col("doc_a"), col("doc_b"))
    // the dup-pair graph is orders of magnitude smaller than the corpus
    // (near-dups are sparse by definition): materialize it ONCE, eagerly,
    // with lineage truncated — otherwise every propagation round drags
    // the whole Jaccard pipeline through its plan — and shrink to a few
    // partitions so each round's shuffle is proportional to the graph,
    // not to the corpus partitioning
    val edges = pairs.unionByName(
        pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .coalesce(4)
      .localCheckpoint()
    var labels = edges.select(col("doc_a").as("doc")).distinct()
      .withColumn("label", col("doc"))
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
    // label table. The 50-round cap is a backstop at diameter ~2^50;
    // fixture components converge in 2-3 rounds.
    // coalesce the convergence aggregate: a duplicate-free corpus has an
    // empty edge set, sum(label) over zero rows is NULL, and a bare
    // getLong would NPE (the loop below is then a no-op — already at
    // fixpoint)
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("label")), lit(0L))).head.getLong(0)
    var prevSum = labelSum(labels)
    var converged = labels.isEmpty
    var rounds = 0
    while (!converged && rounds < 50) {
      val viaNeighbor = edges
        .join(labels, edges("doc_b") === labels("doc"))
        .select(edges("doc_a").as("doc"), col("label"))
      val viaDouble = labels.as("a")
        .join(labels.as("b"), col("a.label") === col("b.doc"))
        .select(col("a.doc").as("doc"), col("b.label").as("label"))
      labels = labels.unionByName(viaNeighbor).unionByName(viaDouble)
        .groupBy(col("doc")).agg(min(col("label")).as("label"))
        .localCheckpoint()
      val s = labelSum(labels)
      converged = s == prevSum
      prevSum = s
      rounds += 1
    }
    labels.select(col("doc").as("doc_id"), col("label").as("cluster_rep"))
      .orderBy("doc_id")
  }

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

  private val P = 1000000007L

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
    */
  def x2MinHashLsh(s: SparkSession, dir: String): DataFrame = {
    // The signature stage feeds four consumers (both band sides, both
    // verification joins) — persist it so the signatures are computed
    // once. At 100 TB this is the standard "materialize signatures"
    // checkpoint of a MinHash pipeline (storage ~= 1 KB/doc).
    val sig = docShingles(s, dir)
      .withColumn("sig", minhashSig)
      .persist()
    val bands = sig.select(col("doc_id"),
        posexplode(expr("transform(sequence(0, 31), b -> xxhash64(concat_ws(',', slice(sig, b * 4 + 1, 4))))"))
          .as(Seq("band", "bh")))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val withSets = cand
      .join(sig.select(col("doc_id"), col("sh").as("sh_a")), col("doc_a") === col("doc_id")).drop("doc_id")
      .join(sig.select(col("doc_id"), col("sh").as("sh_b")), col("doc_b") === col("doc_id")).drop("doc_id")
    withSets
      .withColumn("c", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard", round(col("c") / (size(col("sh_a")) + size(col("sh_b")) - col("c")), 6))
      .filter(col("jaccard") >= 0.8)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
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

  /** X2c — SimHash hamming-distance near-dup: 4×16-bit band buckets (a
    * pair within hamming ≤ 3 of 64 bits must agree on ≥1 of 4 bands by
    * pigeonhole), then exact hamming verification via bit_count(xor).
    * No SQL oracle (hash-function-specific); pinned by unit tests.
    */
  def x2SimHash(s: SparkSession, dir: String): DataFrame = {
    val sig = Tables.documents(s, dir).select(col("doc_id"), simhashSig.as("sig")).persist()
    val bands = sig.select(col("doc_id"), col("sig"),
      posexplode(expr("transform(sequence(0, 3), b -> (sig >> (b * 16)) % 65536)")).as(Seq("band", "bv")))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("doc_a", "doc_b")
  }

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
  def x2SimHashPortable(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(s, dir)
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
      .orderBy("doc_id")
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
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
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
    * ([[Similarity.bandedCorpus]], OR across 6 bands of 3 planes — the
    * MinHash banding discipline at cosine scale), distinct'd, then
    * exactly verified with the native dot product. The pair-generation
    * shuffle is proportional to per-bucket populations, not n²/2.
    *
    * Round 1 used a single 6-plane cell (all planes must agree): a
    * cosine-0.5 pair collides with probability ≈0.09, and the fixture's
    * one qualifying pair was missed — recall 0. With banding the same
    * pair collides in ≥1 band with ≈0.92, and exact verification makes
    * the output a subset of the exact twin — so when every qualifying
    * pair lands in a shared band (verified non-vacuously in LlmOpsSpec
    * at sf0.01, deterministic planes), the output EQUALS the exact
    * all-pairs query, which is also its oracle.
    *
    * Measured honestly across scales (deterministic planes, offline
    * numpy replay): sf0.01 catches 1/1 qualifying pair (oracle
    * equality); sf0.1 catches 13/14 (recall 0.93, pinned in LlmOpsSpec).
    * Wider banding (10×3) would catch 14/14 but generates MORE candidate
    * pairs than brute force on these uniform-random fixtures — at a
    * cosine-0.5 threshold on structureless data LSH cannot prune and
    * recall-vs-candidates is a straight trade. On real near-dup corpora
    * (cosine ≥ 0.9, per-plane p ≥ 0.93) the same 6×3 geometry catches
    * ≥1-(1-0.8)⁶ ≈ 0.9999 of pairs with far sparser buckets — that is
    * the regime this operator is the scale path for.
    */
  def x2EmbeddingLsh(s: SparkSession, dir: String): DataFrame = {
    // banded corpus feeds both candidate sides and both verification
    // joins — persist so signatures are computed once
    val e = Similarity.bandedCorpus(s, dir).persist()
    val bb = e.select(col("vec_id"), posexplode(col("bands")).as(Seq("band", "bv")))
    val cand = bb.as("a").join(bb.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv")
          && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    cand
      .join(e.select(col("vec_id").as("vec_a"), col("e").as("ea"), col("norm").as("na")), Seq("vec_a"))
      .join(e.select(col("vec_id").as("vec_b"), col("e").as("eb"), col("norm").as("nb")), Seq("vec_b"))
      .withColumn("dot", graft.functions.VectorFunctions.dotF64(col("ea"), col("eb")))
      .withColumn("cosine", round(col("dot") / (col("na") * col("nb")), 6))
      .filter(col("cosine") >= 0.5)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
      .orderBy("vec_a", "vec_b")
  }

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
    */
  def x2IncrementalLsh(s: SparkSession, dir: String): DataFrame = {
    // signatures feed the band probe and the verification joins — persist
    // (in production: read the corpus side from the signature store)
    val sig = docShingles(s, dir).withColumn("sig", minhashSig).persist()
    def bandsOf(df: DataFrame, idAs: String): DataFrame =
      df.select(col("doc_id").as(idAs),
        posexplode(expr("transform(sequence(0, 31), b -> xxhash64(concat_ws(',', slice(sig, b * 4 + 1, 4))))"))
          .as(Seq("band", "bh")))
    val corpus = sig.filter(col("doc_id") % 5 =!= 0)
    val batch  = sig.filter(col("doc_id") % 5 === 0)
    val cand = bandsOf(batch, "batch_id")
      .join(bandsOf(corpus, "corpus_id"), Seq("band", "bh"))
      .select(col("batch_id"), col("corpus_id"))
      .distinct()
    val dropped = cand
      .join(batch.select(col("doc_id"), col("sh").as("sh_b")), col("batch_id") === col("doc_id")).drop("doc_id")
      .join(corpus.select(col("doc_id"), col("sh").as("sh_c")), col("corpus_id") === col("doc_id")).drop("doc_id")
      .withColumn("c", size(array_intersect(col("sh_b"), col("sh_c"))).cast("double"))
      .filter(round(col("c") / (size(col("sh_b")) + size(col("sh_c")) - col("c")), 6) >= 0.8)
      .select(col("batch_id").as("doc_id"))
      .distinct()
    // admit from the full batch (docs under 3 tokens have no shingles and
    // are admitted by construction)
    Tables.documents(s, dir).filter(col("doc_id") % 5 === 0)
      .join(dropped, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy("doc_id")
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
    * At 100 TB the eval side is a benchmark suite — megabytes — so its
    * shingle set BROADCASTS and the train side never shuffles at all;
    * at fixture scale both sides are corpus splits and the join
    * shuffles on the hash. Output counts are per flagged train doc
    * (shared distinct shingles + distinct eval docs hit).
    */
  def x7Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val sh = Tables.documents(s, dir)
      .withColumn("bucket",
        conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10).cast("long") % 100)
      .filter(size(toks) >= 8)
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
}
