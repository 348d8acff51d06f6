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

  /** X3b — LSH-bucketed approximate top-k: queries only score vectors in
    * their own 64-bucket LSH cell. Approximate by construction — no SQL
    * oracle; recall-vs-brute-force and structure are unit-tested.
    */
  def x3AnnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = normed(s, dir).withColumn("sig", lshSig(6))
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
}
