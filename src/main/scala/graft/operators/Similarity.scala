package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.functions.VectorFunctions.dotF64

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

  private def normed(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("norm", sqrt(dotF64(col("e"), col("e"))))

  /** X3a — brute-force cosine top-5 for queries vec_id < 10 (self
    * excluded). Rank by rounded cosine with vec_id tie-break so the
    * ordering is stable across engines.
    */
  def x3CosineTopK(s: SparkSession, dir: String): DataFrame = {
    val corpus = normed(s, dir)
    val queries = normed(s, dir).filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("norm").as("qnorm"))
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("dot", dotF64(col("qe"), col("e")))
      .withColumn("cosine", round(col("dot") / (col("qnorm") * col("norm")), 6))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
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

  private def splitmix64(seed: Long): Long = {
    var x = seed + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Random-hyperplane LSH signature: bit p = sign(v · h_p) over nPlanes
    * hyperplanes with deterministic ±1 components, generated driver-side
    * and embedded as constant-folded array literals (64-dim, matching the
    * fixture embedding width). Narrow map — no shuffle, and the per-plane
    * dot product runs through the native [[graft.functions.DotProductF64]]
    * codegen loop instead of per-element interpreted hashing.
    */
  private def lshSig(nPlanes: Int): org.apache.spark.sql.Column =
    (0 until nPlanes).map { p =>
      val plane = (0 until 64)
        .map(j => if (Math.floorMod(splitmix64(p * 1000L + j), 2L) == 1L) "1D" else "-1D")
        .mkString("array(", ",", ")")
      when(dotF64(col("e"), expr(plane)) >= 0d, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** The LSH-bucketed corpus (vec_id, e, norm, sig) — shared by the ANN
    * top-k and [[Dedup.x2EmbeddingLsh]]'s near-dup scale path.
    */
  private[operators] def bucketed(s: SparkSession, dir: String): DataFrame =
    normed(s, dir).withColumn("sig", lshSig(6))

  /** X3b — LSH-bucketed approximate top-k: queries only score vectors in
    * their own 64-bucket LSH cell. Approximate by construction — no SQL
    * oracle; recall-vs-brute-force and structure are unit-tested.
    */
  def x3AnnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = bucketed(s, dir)
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("norm").as("qnorm"), col("sig"))
    val scored = e.join(broadcast(queries), Seq("sig"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("dot", dotF64(col("qe"), col("e")))
      .withColumn("cosine", round(col("dot") / (col("qnorm") * col("norm")), 6))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cosine"))
      .orderBy("q_id", "rank")
  }

  /** X3c — IVF (inverted-file) approximate top-k, the coarse-quantization
    * scale path: the corpus is partitioned into `nlist` cells around
    * centroids, each query probes only its `nprobe` nearest cells.
    *
    * Centroid construction is fully declarative and deterministic:
    * seed centroids are a hash-ordered sample of the corpus itself,
    * refined by one Lloyd iteration expressed in DataFrame algebra
    * (assign → posexplode dims → per-(cell,dim) mean → re-assemble) —
    * the pattern a production k-means would iterate. At 100 TB the
    * inverted lists are a table partitioned by cell id, so a probe
    * touches nprobe/nlist of the data; the centroid set stays O(nlist)
    * and broadcasts.
    */
  def x3AnnIvf(s: SparkSession, dir: String): DataFrame = {
    val nlist = 16
    val nprobe = 2
    val e = normed(s, dir).persist()

    // deterministic seed centroids: first nlist corpus vectors in
    // xxhash64(vec_id) order (an unbiased sample, reproducible anywhere)
    val seeds = e.withColumn("h", xxhash64(col("vec_id")))
      .orderBy("h").limit(nlist)
      .select(row_number().over(Window.orderBy(col("h"))).as("c_id"), col("e").as("ce"))

    // argmax cell per vector as a hash aggregate (max over a (sim, -c_id)
    // struct = best sim with lowest-c_id tie-break) — partial-aggregates
    // map-side, so assignment costs one narrow shuffle of nlist-wide
    // pre-reduced rows instead of a window sort over the full cross
    def assign(vecs: DataFrame, cents: DataFrame): DataFrame =
      vecs.crossJoin(broadcast(cents))
        .withColumn("sim", dotF64(col("e"), col("ce")) /
          (col("norm") * sqrt(dotF64(col("ce"), col("ce")))))
        .groupBy(col("vec_id"))
        .agg(first(col("e")).as("e"), first(col("norm")).as("norm"),
          max(struct(col("sim"), (-col("c_id")).as("nc"))).as("top"))
        .select(col("vec_id"), col("e"), col("norm"), (-col("top.nc")).as("c_id"))

    // one Lloyd refinement: new centroid = per-cell dimension-wise mean
    val assigned0 = assign(e, seeds)
    // nlist rows; persisted because both the list build and the query
    // probe consume it (recomputing would re-run the Lloyd pipeline)
    val refined = assigned0
      .select(col("c_id"), posexplode(col("e")).as(Seq("dim", "v")))
      .groupBy(col("c_id"), col("dim")).agg(avg(col("v")).as("m"))
      .groupBy(col("c_id"))
      .agg(sort_array(collect_list(struct(col("dim"), col("m")))).as("dm"))
      .select(col("c_id"), expr("transform(dm, x -> x.m)").as("ce"))
      .persist()

    val lists = assign(e, refined) // inverted lists: (cell) -> vectors
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("norm").as("qnorm"))
    // probe assignment: nprobe nearest cells per query
    val qCells = {
      val scored = queries.crossJoin(broadcast(refined))
        .withColumn("sim", dotF64(col("qe"), col("ce")) /
          (col("qnorm") * sqrt(dotF64(col("ce"), col("ce")))))
      val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id"))
      scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= nprobe)
        .select(col("q_id"), col("qe"), col("qnorm"), col("c_id"))
    }
    val scored = lists.join(broadcast(qCells), Seq("c_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine",
        round(dotF64(col("qe"), col("e")) / (col("qnorm") * col("norm")), 6))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cosine"))
      .orderBy("q_id", "rank")
  }
}
