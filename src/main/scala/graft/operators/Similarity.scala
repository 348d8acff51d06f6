package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.functions.VectorFunctions.dotF64
import graft.plans.TopKPerGroup

/** [EXT] Embedding similarity search (SURVEY.md §2.7 X3).
  *
  * Scale design: the brute-force top-k broadcasts the (small) query set
  * and streams the corpus — one pass, no shuffle of the corpus, partial
  * top-k per partition via the rank filter. At 100 TB the corpus side
  * stays partition-parallel; only the per-query candidate rows move. The
  * ANN variant buckets both sides with random-hyperplane LSH so each
  * query only scores its bucket (multiprobe/IVF-style coarse quantization
  * is the same plan with a learned bucketer).
  */
object Similarity {

  private[operators] def normed(s: SparkSession, dir: String): DataFrame =
    normedOf(Tables.embeddings(s, dir))

  /** Frame-scoped [[normed]] — lets the IVF store prepare a corpus
    * SUBSET or an append delta through the identical projection.
    * private[graft]: the Round15 sample-law pin builds its own corpus.
    */
  private[graft] def normedOf(emb: DataFrame): DataFrame =
    // deliberately NOT Spread.byKey'd (round-17 A/B): per-vector dot/
    // norm CPU at fixture scale is far too light to amortize an
    // exchange plus wider downstream stages (x3_cosine_topk regressed
    // 0.23 -> 0.39 s with a spread here), and at production scan
    // parallelism a spread is a no-op anyway — the "corpus never
    // shuffles" plan shape stays byte-for-byte
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("norm", sqrt(dotF64(col("e"), col("e"))))

  /** X3a — brute-force cosine top-5 for queries vec_id < 10 (self
    * excluded). Rank by rounded cosine with vec_id tie-break so the
    * ordering is stable across engines.
    */
  def x3CosineTopK(s: SparkSession, dir: String): DataFrame =
    bruteTopK(normed(s, dir))

  /** Brute-force top-5 over a prepared (vec_id, e, norm) corpus — shared
    * by [[x3CosineTopK]] and [[x3AnnRecall]] (which passes an
    * already-persisted corpus so the recall query scans parquet once).
    */
  private def bruteTopK(corpus: DataFrame): DataFrame = {
    val queries = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("norm").as("qnorm"))
    val scored = corpus.select(col("vec_id"), col("e"), col("norm"))
      .crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("dot", dotF64(col("qe"), col("e")))
      .withColumn("cosine", round(col("dot") / (col("qnorm") * col("norm")), 6))
      // explicit pre-projection: the survivor shuffle carries 3 scalars,
      // not the embeddings (TopKColumnPruning would also enforce this)
      .select(col("q_id"), col("vec_id"), col("cosine"))
    TopKPerGroup.topKRanked(scored, Seq(col("q_id")),
        Seq(col("cosine").desc, col("vec_id")), 5, "rank")
      .select(col("q_id"), col("rank"), col("vec_id"), col("cosine"))
      .orderBy("q_id", "rank")
  }

  val x3Sql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e,
      |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
      |  FROM embeddings),
      |scored AS (
      |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
      |    round(list_dot_product(q.e, c.e) / (q.norm * c.norm), 6) AS cosine
      |  FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id != q.vec_id)
      |SELECT q_id, rank, vec_id, cosine FROM (
      |  SELECT q_id, vec_id, cosine,
      |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
      |  FROM scored)
      |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  /** Banding geometry shared by the ANN top-k, the embedding near-dup
    * scale path ([[Dedup.x2EmbeddingLsh]]), and the generated DuckDB
    * recall oracle. 6 bands × 3 planes: a pair at cosine c agrees with a
    * plane with p = 1 - acos(c)/π, so a cosine-0.5 pair (p ≈ 0.67)
    * collides in ≥1 band with 1-(1-p³)⁶ ≈ 0.92 — single-cell exact
    * 6-plane match (p⁶ ≈ 0.09) is what produced recall 0 in round 1.
    */
  private[operators] val LshBands = 6
  private[operators] val LshRowsPerBand = 3

  /** ±1 components of deterministic hyperplane p (64-dim) — DELEGATES to
    * the native expression's own derivation
    * ([[graft.functions.HyperplaneBandSig.component]]) so the DuckDB
    * oracle literals generated here can never drift from the planes the
    * Spark pipeline actually signs with (a re-derived copy used to live
    * here; parity held only by a spec).
    */
  private def planeComponents(p: Int): IndexedSeq[Int] =
    (0 until 64).map(j => graft.functions.HyperplaneBandSig.component(p, j).toInt)

  private def planeLit(p: Int): org.apache.spark.sql.Column =
    expr(planeComponents(p).map(c => s"${c}D").mkString("array(", ",", ")"))

  private def planeSqlList(p: Int): String =
    planeComponents(p).mkString("[", ",", "]") + "::DOUBLE[]"

  /** Banded random-hyperplane signature: an array of `nBands` band
    * values, band b = the `rowsPerBand` sign bits of planes
    * b*rpb..b*rpb+rpb-1 packed into a long. Pairs collide when ANY band
    * agrees — the MinHash banding discipline at cosine scale. Narrow map,
    * no shuffle; since round 8 the whole signature is ONE native
    * compiled loop ([[graft.functions.HyperplaneBandSig]]): the previous
    * Column-composed form inlined bands×planes×64 literal doubles into
    * the projection, which blew janino's 64 KB method limit at the
    * corpus-derived geometries (225+ planes) and silently dropped the
    * stage to interpreted evaluation. [[bandedSigComposed]] keeps the
    * composed form as the parity witness.
    */
  private def bandedSig(nBands: Int, rowsPerBand: Int): org.apache.spark.sql.Column =
    graft.functions.VectorFunctions.hyperplaneBands(col("e"), nBands, rowsPerBand)

  /** The pre-round-8 Column-composed formulation of [[bandedSig]] —
    * semantically identical by construction (same planes, same `>= 0`
    * sign rule, bit-sum == bit-OR for distinct powers of two); kept
    * non-private so Round8Spec can pin native == composed on real
    * fixture vectors at both a small and a derived-scale geometry.
    */
  private[graft] def bandedSigComposed(nBands: Int, rowsPerBand: Int): org.apache.spark.sql.Column =
    array((0 until nBands).map { b =>
      (0 until rowsPerBand).map { r =>
        val p = b * rowsPerBand + r
        when(dotF64(col("e"), planeLit(p)) >= 0d, lit(1L << r)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)

  /** The banded corpus (vec_id, e, norm, bands) — shared by the ANN
    * top-k and [[Dedup.x2EmbeddingLsh]]'s near-dup scale path. Geometry
    * defaults to the cosine-0.5 fixture regime; the near-dup regime
    * passes narrower-bucket geometry (see [[Dedup.x2EmbeddingLshAt]]).
    *
    * On the stage caches in this family: they are registered through
    * [[Caches.scoped]] and released at the session owner's query
    * boundary (r13). Unpersisting before return isn't possible without
    * materializing (localCheckpoint), which would destroy the executed
    * plans PlanSpec pins for these queries — so the release hook lives
    * in the harness, and between releases growth stays bounded by the
    * CacheManager's logical-plan dedup (repeated calls of one entry
    * point re-reference ONE entry — the benign "already cached"
    * warnings).
    */
  private[graft] def bandedCorpus(s: SparkSession, dir: String,
                                  nBands: Int = LshBands,
                                  rowsPerBand: Int = LshRowsPerBand): DataFrame =
    normed(s, dir).withColumn("bands", bandedSig(nBands, rowsPerBand))

  /** X3b — banded-LSH approximate top-k: a query's candidate set is the
    * union of its 6 band buckets (OR across bands), exactly scored, then
    * top-5. The corpus never shuffles: band rows join against the
    * broadcast query side, the distinct'd (q_id, vec_id) candidate list
    * is broadcast back. Approximate by construction — recall vs brute
    * force is quantified by the oracle-twinned [[x3AnnRecall]].
    */
  def x3AnnLsh(s: SparkSession, dir: String): DataFrame =
    annTopK(Caches.scoped(bandedCorpus(s, dir)))

  /** The banded-LSH ANN top-k at a caller-chosen query-set width — the
    * hook for driving the FULL ANN pipeline at high group cardinality
    * (Round7Spec pins that its grouped top-k engages the
    * TopKPerGroupExec sorter fallback instead of growing hash state).
    */
  private[graft] def annTopKAll(s: SparkSession, dir: String, maxQ: Long): DataFrame =
    annTopK(Caches.scoped(bandedCorpus(s, dir)), maxQ)

  /** Banded-LSH top-5 over a prepared (vec_id, e, norm, bands) corpus. */
  private def annTopK(e: DataFrame, maxQ: Long = 10L): DataFrame = {
    val bb = e.select(col("vec_id"), posexplode(col("bands")).as(Seq("band", "bv")))
    val qb = e.filter(col("vec_id") < maxQ)
      .select(col("vec_id").as("q_id"), posexplode(col("bands")).as(Seq("band", "bv")))
    val cand = bb.join(broadcast(qb), Seq("band", "bv"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"))
      .distinct()
    val queries = e.filter(col("vec_id") < maxQ)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("norm").as("qnorm"))
    val scored = e.select(col("vec_id"), col("e"), col("norm"))
      .join(broadcast(cand), Seq("vec_id"))
      .join(broadcast(queries), Seq("q_id"))
      .withColumn("cosine", round(dotF64(col("qe"), col("e")) / (col("qnorm") * col("norm")), 6))
      .select(col("q_id"), col("vec_id"), col("cosine"))
    TopKPerGroup.topKRanked(scored, Seq(col("q_id")),
        Seq(col("cosine").desc, col("vec_id")), 5, "rank")
      .select(col("q_id"), col("rank"), col("vec_id"), col("cosine"))
      .orderBy("q_id", "rank")
  }

  /** X3d — recall@5 of the banded-LSH ANN against the brute-force top-5,
    * per query, in one plan. Oracle-twinned: the DuckDB SQL recomputes
    * the identical pipeline (same deterministic plane constants, same
    * rounding and tie-breaks), so "approximate" is a measured number the
    * driver hash-checks, not a rows-only claim.
    */
  def x3AnnRecall(s: SparkSession, dir: String): DataFrame = {
    // one persisted banded corpus feeds BOTH pipelines — the parquet
    // scan, norms, and signatures are computed once for the whole query
    val corpus = Caches.scoped(bandedCorpus(s, dir))
    val exact = bruteTopK(corpus).select(col("q_id"), col("vec_id"))
    val ann = annTopK(corpus).select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    exact.join(ann, Seq("q_id", "vec_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_exact"), sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("q_id"), col("n_exact"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_exact"), 6).as("recall_at_5"))
      .orderBy("q_id")
  }

  /** Shared DuckDB CTE block regenerating the banded-LSH ANN pipeline
    * from the same deterministic plane constants as the Spark side —
    * feeds both the [[x3AnnLshSql]] twin and the [[x3AnnRecallSql]] one.
    */
  private def annPipelineCtes: String = {
    val bandSelects = (0 until LshBands).map { b =>
      val bv = (0 until LshRowsPerBand).map { r =>
        val p = b * LshRowsPerBand + r
        s"(CASE WHEN list_dot_product(e, ${planeSqlList(p)}) >= 0 THEN ${1L << r} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, $b AS band, $bv AS bv FROM e"
    }.mkString("\n  UNION ALL ")
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS e,
       |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
       |  FROM embeddings),
       |bands AS (
       |  $bandSelects),
       |qb AS (SELECT vec_id AS q_id, band, bv FROM bands WHERE vec_id < 10),
       |cand AS (
       |  SELECT DISTINCT qb.q_id, b.vec_id
       |  FROM bands b JOIN qb ON b.band = qb.band AND b.bv = qb.bv AND b.vec_id != qb.q_id),
       |ann_scored AS (
       |  SELECT c.q_id, c.vec_id,
       |    round(list_dot_product(q.e, v.e) / (q.norm * v.norm), 6) AS cosine
       |  FROM cand c JOIN e v ON c.vec_id = v.vec_id JOIN e q ON c.q_id = q.vec_id)""".stripMargin
  }

  /** DuckDB twin of [[x3AnnLsh]] itself — "approximate" does not mean
    * "unverifiable": the twin regenerates the identical banded pipeline,
    * so the driver hash-checks the ANN output, not just its recall.
    */
  val x3AnnLshSql: String =
    s"""WITH $annPipelineCtes
       |SELECT q_id, rank, vec_id, cosine FROM (
       |  SELECT q_id, vec_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
       |  FROM ann_scored)
       |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  /** DuckDB twin of [[x3AnnRecall]], generated from the same plane
    * constants so both engines derive identical band buckets.
    */
  val x3AnnRecallSql: String = {
    s"""WITH $annPipelineCtes,
       |ann AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rk
       |    FROM ann_scored) WHERE rk <= 5),
       |ex AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY round(list_dot_product(q.e, c.e) / (q.norm * c.norm), 6) DESC, c.vec_id) AS rk
       |    FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id != q.vec_id) WHERE rk <= 5)
       |SELECT ex.q_id, CAST(count(*) AS BIGINT) AS n_exact,
       |  CAST(sum(CASE WHEN ann.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       |  round(sum(CASE WHEN ann.vec_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS recall_at_5
       |FROM ex LEFT JOIN ann ON ex.q_id = ann.q_id AND ex.vec_id = ann.vec_id
       |GROUP BY ex.q_id ORDER BY ex.q_id""".stripMargin
  }

  /** X3e — SQ8 scalar quantization + measured recall@5. Each vector is
    * compressed to `array<tinyint>` (symmetric per-vector scale
    * q = round(x·127/max_abs)) — 8× narrower than the float64 working set,
    * the standard first rung of vector-index compression: at 100 TB the
    * quantized corpus is what sits in memory/shuffle, and candidates are
    * rescored from the exact vectors only when needed. Scoring uses the
    * approximate cosine dot(q_a,q_b)·ma_a·ma_b / (127²·‖a‖·‖b‖); the
    * query reports per-query recall of SQ8 top-5 vs exact top-5, and the
    * DuckDB twin regenerates the identical quantization (same rounding,
    * same tie-breaks) so the compression loss is an oracle-checked number.
    */
  def x3Sq8Recall(s: SparkSession, dir: String): DataFrame = {
    val corpus = normed(s, dir)
      .withColumn("ma", expr("aggregate(e, 0D, (acc, x) -> greatest(acc, abs(x)))"))
      // the ma = 0 arm (an all-zero vector) quantizes to 0 explicitly:
      // x/0 is NaN and ANSI CAST(NaN AS TINYINT) would abort the whole
      // query; the twin carries the identical guard
      .withColumn("q8", expr(
        "transform(e, x -> cast(round(CASE WHEN ma = 0D THEN 0D ELSE x * 127.0D / ma END, 0) as tinyint))"))
      .transform(Caches.scoped)
    val queries = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("q8").as("qq8"),
        col("ma").as("qma"), col("norm").as("qnorm"))
    val scored = corpus.select(col("vec_id"), col("q8"), col("ma"), col("norm"))
      .crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("s", round(
        dotF64(col("qq8"), col("q8")) * col("qma") * col("ma") /
          (lit(16129.0) * col("qnorm") * col("norm")), 6))
    val sq8Top = TopKPerGroup(scored.select(col("q_id"), col("vec_id"), col("s")),
        Seq(col("q_id")), Seq(col("s").desc, col("vec_id")), 5)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    val exact = bruteTopK(corpus).select(col("q_id"), col("vec_id"))
    exact.join(sq8Top, Seq("q_id", "vec_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_exact"), sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("q_id"), col("n_exact"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_exact"), 6).as("recall_at_5"))
      .orderBy("q_id")
  }

  val x3Sq8RecallSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e,
      |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm,
      |  list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS ma
      |  FROM embeddings),
      |q8 AS (SELECT vec_id, norm, ma,
      |  list_transform(e, x -> round(CASE WHEN ma = 0 THEN 0 ELSE x * 127.0 / ma END, 0)) AS q8 FROM e),
      |sq8_scored AS (
      |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
      |    round(list_dot_product(q.q8, c.q8) * q.ma * c.ma
      |          / (16129.0 * q.norm * c.norm), 6) AS s
      |  FROM q8 q JOIN q8 c ON q.vec_id < 10 AND c.vec_id != q.vec_id),
      |sq8 AS (
      |  SELECT q_id, vec_id FROM (
      |    SELECT q_id, vec_id,
      |      row_number() OVER (PARTITION BY q_id ORDER BY s DESC, vec_id) AS rk
      |    FROM sq8_scored) WHERE rk <= 5),
      |ex AS (
      |  SELECT q_id, vec_id FROM (
      |    SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
      |      row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY round(list_dot_product(q.e, c.e) / (q.norm * c.norm), 6) DESC, c.vec_id) AS rk
      |    FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id != q.vec_id) WHERE rk <= 5)
      |SELECT ex.q_id, CAST(count(*) AS BIGINT) AS n_exact,
      |  CAST(sum(CASE WHEN sq8.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
      |  round(sum(CASE WHEN sq8.vec_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS recall_at_5
      |FROM ex LEFT JOIN sq8 ON ex.q_id = sq8.q_id AND ex.vec_id = sq8.vec_id
      |GROUP BY ex.q_id ORDER BY ex.q_id""".stripMargin

  /** X3c — IVF (inverted-file) approximate top-k, the coarse-quantization
    * scale path: the corpus is partitioned into `nlist` cells around
    * centroids, each query probes only its `nprobe` nearest cells.
    *
    * Centroid construction is fully declarative and deterministic:
    * centroids train on the [[IvfTrainSample]] md5-rank sample of the
    * corpus (seed = its first nlist vectors), refined by one Lloyd
    * iteration expressed in DataFrame algebra (assign → posexplode dims
    * → per-(cell,dim) mean → re-assemble) — the pattern a production
    * k-means would iterate. At 100 TB the training cost is O(sample),
    * the single full assignment pass is the only corpus-wide stage,
    * and the inverted lists are a table partitioned by cell id, so a
    * probe touches nprobe/nlist of the data; the centroid set stays
    * O(nlist) and broadcasts.
    */
  def x3AnnIvf(s: SparkSession, dir: String): DataFrame = {
    val e = Caches.scoped(normed(s, dir))
    val (refined, lists) = ivfIndex(e)
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("norm").as("qnorm"))
    ivfScore(lists, ivfQueryCells(refined, queries))
  }

  /** Embedding dimensionality of the fixture corpus — interpolated into
    * the generated twin SQL (a hardcoded literal there could silently
    * drift from the Spark side, which derives it from the data).
    */
  private[graft] val EmbeddingDims = 64

  /** IVF cell count. 32 at fixture scale; a production deployment
    * scales it with the corpus while the centroid set stays
    * broadcast-sized.
    */
  private[graft] val IvfNList = 32

  /** Training-sample size for centroid learning: 256 vectors per cell
    * (the FAISS `ClusteringParameters.max_points_per_centroid` rule of
    * thumb — k-means on more than a few hundred points per centroid
    * buys jitter, not better centroids). Training on a deterministic
    * md5-rank sample instead of the corpus is what makes the full
    * re-train scale-safe (VERDICT r14 #1): the Lloyd refinement costs
    * O(sample) regardless of corpus size, and the only remaining
    * O(corpus · nlist) stage is the single frozen-centroid assignment
    * pass every maintenance path already pays. Every fixture corpus
    * (≤ 2000 vectors) is smaller than the sample, so at oracle/bench
    * scale the sample IS the corpus and results are bit-identical to
    * full-corpus training — the DuckDB twin expresses the same LIMIT.
    */
  private[graft] val IvfTrainSample = 256 * IvfNList

  /** 20/32 cells probed: on the uniform-random fixture embeddings (no
    * cluster structure for the quantizer to exploit) the deterministic
    * pipeline measures recall@5 vs brute force at 0.90 / 0.96 / 0.96
    * across sf0.001 / 0.01 / 0.1 — clearing the 0.85 floor pinned in
    * LlmOpsSpec at every scale. The config was swept OFFLINE through
    * the bit-identical twin pipeline: extra Lloyd iterations do NOT
    * help on structureless data (lloyd=2 measured 0.82/0.92/0.86,
    * lloyd=3 0.86/0.90/0.82 — centroids of a uniform cloud just jitter)
    * while widening the probe 16→20 lifted the floor 0.84→0.90 for a
    * 25% larger scored-candidate set. Clustered real-world embeddings
    * hit the same recall at far smaller probed fractions; the probe
    * width is the recall/cost dial.
    */
  private[graft] val IvfNProbe = 20

  /** The IVF INDEX build — (refined centroids, inverted lists): the
    * part of [[x3AnnIvf]] that is a build artifact, not a query
    * ([[IvfStore]] materializes exactly this pair). The centroid frame
    * comes back persisted (two consumers: the list build and every
    * probe).
    */
  /** Argmax cell per vector as a hash aggregate (max over a (sim, -c_id)
    * struct = best sim with lowest-c_id tie-break) — partial-aggregates
    * map-side, so assignment costs one narrow shuffle of nlist-wide
    * pre-reduced rows instead of a window sort over the full cross.
    * Per-vector pure, so assigning a subset then a delta equals one
    * assignment of their union — the identity the IVF store's
    * incremental append rests on.
    */
  private[graft] def ivfAssign(vecs: DataFrame, cents: DataFrame): DataFrame =
    // centroid norms hoisted onto the nlist-row frame BEFORE the cross
    // join: computed once per centroid instead of once per (vector,
    // centroid) pair — at 1M vectors × 32 cells that is ~32M redundant
    // 64-dim dots + sqrt per assignment pass. norm * cnorm evaluates the
    // same IEEE product as the inline form, so results are bit-identical
    // (the DuckDB twin keeps the per-pair form; sqrt is deterministic).
    vecs.crossJoin(broadcast(
        cents.withColumn("cnorm", sqrt(dotF64(col("ce"), col("ce"))))))
      .withColumn("sim", dotF64(col("e"), col("ce")) / (col("norm") * col("cnorm")))
      .groupBy(col("vec_id"))
      .agg(first(col("e")).as("e"), first(col("norm")).as("norm"),
        max(struct(col("sim"), (-col("c_id")).as("nc"))).as("top"))
      .select(col("vec_id"), col("e"), col("norm"), (-col("top.nc")).as("c_id"))

  private[graft] def ivfIndex(e: DataFrame): (DataFrame, DataFrame) = {
    val (refined, lists, _) = ivfIndexWithSample(e)
    (refined, lists)
  }

  /** [[ivfIndex]] plus a handle on the persisted training sample, for
    * maintenance lanes that must free its cached blocks on exit (the
    * query paths leave it to the session owner's release boundary, like
    * `refined`).
    */
  private[graft] def ivfIndexWithSample(e: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val nlist = IvfNList

    // TRAINING SAMPLE (VERDICT r14 #1): the first [[IvfTrainSample]]
    // corpus vectors in md5(vec_id) order — an unbiased deterministic
    // sample ANY engine reproduces bit-identically, ≤ 8192 rows ≈ 4 MB
    // cached (the FAISS train-on-sample discipline). Seed selection and
    // the Lloyd refinement below run over it, so training costs
    // O(sample) regardless of corpus size; the TakeOrdered producing it
    // is per-partition top-k, never a corpus shuffle. Kept DISTRIBUTED
    // and plan-cached rather than collected: a driver-side LocalRelation
    // is rebuilt with fresh row objects per call, which defeats the
    // CacheManager's plan-dedup for everything downstream (measured as
    // a ~1.5× warm-bench regression on the x3_ann_ivf family before
    // this form), while the cached plan is stable across calls.
    val sample = Caches.scoped(
      e.withColumn("h", md5(col("vec_id").cast("string")))
        .select(col("vec_id"), col("e"), col("norm"), col("h"))
        .orderBy("h").limit(IvfTrainSample))

    // deterministic seed centroids: first nlist vectors in md5(vec_id)
    // order — the sample is the md5-order PREFIX of the corpus, so its
    // first nlist rows are exactly the corpus's (the DuckDB twin below
    // regenerates the identical seed set)
    val seeds = sample.orderBy("h").limit(nlist)
      .select(row_number().over(Window.orderBy(col("h"))).as("c_id"), col("e").as("ce"))

    // one Lloyd refinement over the SAMPLE: new centroid = per-cell
    // dimension-wise mean. The mean is EXACT (decimal sum / count):
    // double summation order is partition-dependent in Spark, and the
    // oracle twin must derive bit-identical centroids
    val assigned0 = ivfAssign(sample.select(col("vec_id"), col("e"), col("norm")), seeds)
    // nlist rows; persisted because both the list build and the query
    // probe consume it (recomputing would re-run the Lloyd pipeline)
    val refined = assigned0
      .select(col("c_id"), posexplode(col("e")).as(Seq("dim", "v")))
      .groupBy(col("c_id"), col("dim")).agg(graft.engine.Exact.davg(col("v"), 16).as("m"))
      .groupBy(col("c_id"))
      .agg(sort_array(collect_list(struct(col("dim"), col("m")))).as("dm"))
      .select(col("c_id"), expr("transform(dm, x -> x.m)").as("ce"))
      .transform(Caches.scoped)

    val lists = ivfAssign(e, refined) // inverted lists: (cell) -> vectors
    (refined, lists, sample)
  }

  /** Probe assignment: the [[IvfNProbe]] nearest cells per query —
    * (q_id, qe, qnorm, c_id).
    */
  private[graft] def ivfQueryCells(refined: DataFrame, queries: DataFrame): DataFrame = {
    // centroid norms hoisted pre-crossJoin, as in [[ivfAssign]]
    val scored = queries.crossJoin(broadcast(
        refined.withColumn("cnorm", sqrt(dotF64(col("ce"), col("ce"))))))
      .withColumn("sim", dotF64(col("qe"), col("ce")) / (col("qnorm") * col("cnorm")))
    TopKPerGroup(scored, Seq(col("q_id")), Seq(col("sim").desc, col("c_id")), IvfNProbe)
      .select(col("q_id"), col("qe"), col("qnorm"), col("c_id"))
  }

  /** Probe-limited scoring + ranked top-5 over the inverted lists —
    * the query half of the IVF pipeline. `lists` may be the freshly
    * built frame or a (partition-pruned) store scan; joins are
    * name-based so either column order works.
    */
  private[graft] def ivfScore(lists: DataFrame, qCells: DataFrame): DataFrame = {
    val scored = lists.join(broadcast(qCells), Seq("c_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine",
        round(dotF64(col("qe"), col("e")) / (col("qnorm") * col("norm")), 6))
      .select(col("q_id"), col("vec_id"), col("cosine"))
    TopKPerGroup.topKRanked(scored, Seq(col("q_id")),
        Seq(col("cosine").desc, col("vec_id")), 5, "rank")
      .select(col("q_id"), col("rank"), col("vec_id"), col("cosine"))
      .orderBy("q_id", "rank")
  }

  /** DuckDB twin of [[x3AnnIvf]] — the full IVF pipeline (md5-rank
    * training sample, argmax assignment, one exact-mean Lloyd
    * refinement over the sample, full-corpus list assignment,
    * nprobe=20 probe, probe-limited scoring) regenerated in SQL. Every
    * stage is bit-deterministic on both engines: md5 is the portable
    * seed order, the centroid means are exact decimal sums, and the
    * dot/argmax arithmetic is IEEE double evaluated in the same element
    * order. Like the LSH twin, this converts "approximate" from a
    * rows-only claim into a hash-checked result.
    */
  private def ivfPipelineSql(extraCtes: String, base: String,
                             listsBase: String = "e"): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e,
      |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
      |  FROM embeddings),$extraCtes
      |smp AS (
      |  SELECT vec_id, e, norm FROM $base
      |  ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT $IvfTrainSample),
      |seeds AS (
      |  SELECT CAST(row_number() OVER (ORDER BY h) AS INTEGER) AS c_id, ce FROM (
      |    SELECT md5(CAST(vec_id AS VARCHAR)) AS h, e AS ce FROM smp
      |    ORDER BY h LIMIT $IvfNList)),
      |a0 AS (
      |  SELECT vec_id, e, norm, c_id FROM (
      |    SELECT v.vec_id, v.e, v.norm, s.c_id,
      |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
      |        list_dot_product(v.e, s.ce) / (v.norm * sqrt(list_dot_product(s.ce, s.ce))) DESC,
      |        s.c_id) AS rk
      |    FROM smp v CROSS JOIN seeds s) WHERE rk = 1),
      |refined AS (
      |  SELECT c_id, list(m ORDER BY dim) AS ce FROM (
      |    SELECT c_id, dim,
      |      CAST(SUM(CAST(val AS DECIMAL(28,16))) AS DOUBLE) / COUNT(val) AS m
      |    FROM (SELECT c_id, i AS dim, e[i + 1] AS val
      |          FROM a0, unnest(range(0, $EmbeddingDims)) AS t(i))
      |    GROUP BY c_id, dim)
      |  GROUP BY c_id),
      |lists AS (
      |  SELECT vec_id, e, norm, c_id FROM (
      |    SELECT v.vec_id, v.e, v.norm, r.c_id,
      |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
      |        list_dot_product(v.e, r.ce) / (v.norm * sqrt(list_dot_product(r.ce, r.ce))) DESC,
      |        r.c_id) AS rk
      |    FROM $listsBase v CROSS JOIN refined r) WHERE rk = 1),
      |qcells AS (
      |  SELECT q_id, qe, qnorm, c_id FROM (
      |    SELECT q.vec_id AS q_id, q.e AS qe, q.norm AS qnorm, r.c_id,
      |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |        list_dot_product(q.e, r.ce) / (q.norm * sqrt(list_dot_product(r.ce, r.ce))) DESC,
      |        r.c_id) AS rk
      |    FROM e q CROSS JOIN refined r WHERE q.vec_id < 10) WHERE rk <= $IvfNProbe),
      |scored AS (
      |  SELECT qc.q_id, l.vec_id,
      |    round(list_dot_product(qc.qe, l.e) / (qc.qnorm * l.norm), 6) AS cosine
      |  FROM lists l JOIN qcells qc ON l.c_id = qc.c_id AND l.vec_id != qc.q_id)
      |SELECT q_id, rank, vec_id, cosine FROM (
      |  SELECT q_id, vec_id, cosine,
      |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
      |  FROM scored)
      |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  val x3AnnIvfSql: String = ivfPipelineSql("", "e")

  /** DuckDB twin of [[IvfStore.x3AnnIvfIncremental]]: centroids (seed
    * sample + Lloyd refinement) derive from the BASE subset
    * (`vec_id % 7 != 0` — the corpus before the append), while the
    * inverted lists and the probe span the FULL corpus. That is exactly
    * what the incremental append produces — frozen generation centroids,
    * per-vector argmax assignment of the delta (assignment is per-vector
    * pure, so subset-then-delta equals one full assignment) — and every
    * stage stays bit-deterministic, so the maintained index is
    * hash-checked end to end.
    */
  val x3AnnIvfIncSql: String = ivfPipelineSql(
    "\neb AS (SELECT * FROM e WHERE vec_id % 7 != 0),", "eb")

  /** DuckDB twin of [[IvfStore.x3AnnIvfDelete]]: centroids (seed sample
    * + Lloyd refinement) derive from the FULL corpus — the frozen
    * generation the delete never re-trains — while the inverted lists
    * are reduced by the delete predicate
    * ([[IvfStore.DeletePredicateSql]]); queries span the full table
    * (the predicate spares them). Exactly what the tombstone mask
    * serves, stage-for-stage bit-deterministic, so "deleted vectors
    * vanish from every top-k" is hash-checked, not asserted.
    */
  val x3AnnIvfDelSql: String = ivfPipelineSql(
    s"\ner AS (SELECT * FROM e WHERE NOT (${IvfStore.DeletePredicateSql})),",
    "e", listsBase = "er")
}
