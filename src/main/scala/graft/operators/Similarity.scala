package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

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
      .withColumn("norm",
        sqrt(expr("aggregate(zip_with(e, e, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")))

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
      .withColumn("dot", expr("aggregate(zip_with(qe, e, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"))
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

  /** Random-hyperplane LSH signature: bit p = sign(v · h_p) over
    * NPLANES pseudo-hyperplanes with deterministic ±1 components derived
    * from xxhash64(plane, dim). Narrow map — no shuffle, codegen'd.
    */
  private def lshSig(nPlanes: Int): org.apache.spark.sql.Column = expr(
    s"""aggregate(sequence(0, ${nPlanes - 1}), 0L, (acc, p) ->
       |  acc + if(
       |    aggregate(sequence(0, size(e) - 1), 0D,
       |      (s, j) -> s + element_at(e, j + 1)
       |                    * if(pmod(xxhash64(concat('pl_', p, '_', j)), 2) = 1, 1D, -1D)) >= 0D,
       |    shiftleft(1L, p), 0L))""".stripMargin)

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
      .withColumn("dot", expr("aggregate(zip_with(qe, e, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"))
      .withColumn("cosine", round(col("dot") / (col("qnorm") * col("norm")), 6))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cosine"))
      .orderBy("q_id", "rank")
  }
}
