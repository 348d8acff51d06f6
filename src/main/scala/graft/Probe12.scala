package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 measurement: WHY does a constant-size dynamic-overwrite
  * batch write slow down as the target tree accumulates batches?
  * Probe11's per-stage split shows the admission climb lives almost
  * entirely in `write-bands` (2.3 s → 4.7 s over ten identical-size
  * batches) — this probe writes the SAME 150k-row frame ten times with
  * the BandStore layout (`partitionBy(__batch, __bb)`, dynamic
  * overwrite, one file per bucket) into (a) one accumulating tree and
  * (b) a fresh tree per batch, so tree-size cost separates from JVM
  * state. A third loop writes with `noop`-equivalent static overwrite
  * of a per-batch subdirectory (the layout compactStore produces) for
  * comparison.
  *
  * Usage: runMain graft.Probe12 [sfDir]
  */
object Probe12 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // the first recording omitted the extensions the real admission
      // session installs — keep the probe's session identical to the
      // system under test
      .withExtensions(e => new graft.functions.GraftExtensions()(e))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("probe12").toString
    // a constant bands-shaped frame: ~150k rows of (band, bh, doc_id)
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"))
      .crossJoin(spark.range(32).select(col("id").cast("int").as("band")))
      .select(col("band"), xxhash64(col("doc_id"), col("band")).as("bh"), col("doc_id"))
      .localCheckpoint()
    println(s"[probe12] rows per batch: ${rows.count()}")

    def writeBatch(dir: String, b: Long): Double = {
      val t0 = System.nanoTime()
      rows.withColumn("__batch", lit(b))
        .withColumn("__bb", pmod(col("bh"), lit(64)).cast("int"))
        .repartition(col("__bb"))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch", "__bb")
        .parquet(dir)
      (System.nanoTime() - t0) / 1e9
    }
    val accum = (0 until 10).map(b => writeBatch(s"$work/accum", b.toLong))
    val fresh = (0 until 10).map(b => writeBatch(s"$work/fresh-$b", b.toLong))
    // same data, same one-file-per-bucket layout, but the batch writes a
    // SUBDIRECTORY statically — no dynamic-overwrite machinery
    def writeStatic(dir: String, b: Long): Double = {
      val t0 = System.nanoTime()
      rows.withColumn("__bb", pmod(col("bh"), lit(64)).cast("int"))
        .repartition(col("__bb"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("__bb")
        .parquet(s"$dir/__batch=$b")
      (System.nanoTime() - t0) / 1e9
    }
    val static = (0 until 10).map(b => writeStatic(s"$work/static", b.toLong))
    // the REAL write's input shape: a cached signed frame (doc_id, sh,
    // sig arrays) exploded to bands inside the write job — not a
    // pre-checkpointed flat frame. If this loop grows where the flat
    // one is flat, the cost lives in re-reading/exploding the cached
    // input per write, not in the overwrite machinery.
    val sig = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), graft.operators.Dedup.shingles(col("text")).as("sh"))
      .withColumn("sig", graft.operators.Dedup.minhashSig)
      .persist()
    println(s"[probe12] signed docs: ${sig.count()}")
    def writeExploded(dir: String, b: Long): Double = {
      val bands = sig.select(col("doc_id"),
        posexplode(expr(graft.operators.Dedup.bandSql)).as(Seq("band", "bh")))
      val t0 = System.nanoTime()
      bands.withColumn("__batch", lit(b))
        .withColumn("__obatch", lit(b))
        .withColumn("__bb", pmod(col("bh"), lit(64)).cast("int"))
        .repartition(col("__bb"))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch", "__bb")
        .parquet(dir)
      (System.nanoTime() - t0) / 1e9
    }
    val exploded = (0 until 10).map(b => writeExploded(s"$work/exploded", b.toLong))
    // the REAL pipeline's remaining difference: a PERSISTED frame reading
    // the target tree (the probe cache) is still registered when the
    // write commits — InsertIntoHadoopFsRelationCommand ends with
    // refreshByPath(target), which touches every cached plan referencing
    // the path. If this loop grows where the uncached one is flat, the
    // admission climb is the write recaching the batch's own probe.
    val cachedDuring = (0 until 10).map { b =>
      val dir = s"$work/cached-during"
      val probeLike =
        if (b == 0) None
        else {
          val p = spark.read.parquet(dir)
            .filter(col("__bb").isin((0 until 64): _*))
            .select(col("band"), col("bh"), col("doc_id")).persist()
          p.count() // materialize like the admission stats pass does
          Some(p)
        }
      val s = writeBatch(dir, b.toLong)
      probeLike.foreach(_.unpersist())
      s
    }
    def fmt(xs: Seq[Double]) = xs.map(s => f"$s%.2f").mkString(", ")
    println(s"[probe12] accumulating dynamic overwrite: ${fmt(accum)}")
    println(s"[probe12] fresh-tree dynamic overwrite:   ${fmt(fresh)}")
    println(s"[probe12] static per-batch subdir:        ${fmt(static)}")
    println(s"[probe12] cached-sig explode, accum tree: ${fmt(exploded)}")
    println(s"[probe12] write w/ live cache over target: ${fmt(cachedDuring)}")
    spark.stop()
  }
}
