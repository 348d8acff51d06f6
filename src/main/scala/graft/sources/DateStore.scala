package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Exact, Tables}
import graft.operators.StoreDirs

/** S11 [EXT] — DATE-PARTITIONED events store + partition-pruned scan.
  *
  * Why it exists: every fixture table is a single parquet file, so
  * `PruneFileSourcePartitions` (SURVEY §4.2) was the one listed
  * optimization no query exercised (VERDICT r9's named 100 TB-shape
  * gap). At 100 TB an events/lineitem store is date-partitioned as a
  * matter of survival — a date-ranged query must read the days it asks
  * for, not the decade it doesn't — and this store proves that shape
  * end-to-end: the table lands as `event_date=YYYY-MM-DD/` partitions
  * (one atomic generational publish, the [[graft.operators.LabelStore]]
  * idiom), the rollup query filters on the partition column, and
  * PlanSpec pins that the scan's `selectedPartitions` is exactly the
  * requested window, not the full history.
  *
  * The oracle recomputes the same rollup from the fixture events table
  * in DuckDB: store write → partition-pruned read → aggregate must
  * equal a direct aggregate of the source — the round trip itself is
  * under the hash gate.
  */
object DateStore {

  /** (row count, order-insensitive digest) over the full events rows —
    * any append/mutation/delete invalidates the store by measurement.
    */
  private def fingerprintOf(ev: DataFrame): (Long, Long) = {
    val r = ev.agg(count(lit(1)),
      expr("bit_xor(xxhash64(event_id, ts, user_id, event_type, value, props))")).head
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  private case class Gen(k: Long, n: Long, fp: Long, path: Path)

  private val GenName = """gen=(\d+)__n=(\d+)__fp=([0-9a-f]+)""".r

  private def fsOf(s: SparkSession, p: Path) =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  private def listGens(s: SparkSession, storeDir: String): Seq[Gen] = {
    val root = new Path(storeDir)
    val fs = fsOf(s, root)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.collect {
      case st if st.isDirectory => st.getPath.getName match {
        case GenName(k, n, fp) =>
          Some(Gen(k.toLong, n.toLong, java.lang.Long.parseUnsignedLong(fp, 16), st.getPath))
        case _ => None
      }
    }.flatten.sortBy(_.k)
  }

  def defaultStoreDir(dir: String): String =
    StoreDirs.canonical("graft-events-bydate", dir)

  /** (Re)write the partitioned table iff the events fingerprint no
    * longer matches the newest generation; true when a write ran. The
    * partition column is `event_date = to_date(ts)` — ~daily grain, the
    * standard lakehouse layout for an append-mostly event stream (fine
    * enough to prune a week out of a year, coarse enough that files
    * stay larger than the footer overhead).
    */
  def ensureCurrent(s: SparkSession, dir: String, storeDir: String): Boolean = {
    val ev = Tables.events(s, dir)
    val (n, fp) = fingerprintOf(ev)
    val gens = listGens(s, storeDir)
    if (gens.lastOption.exists(g => g.n == n && g.fp == fp)) return false
    val root = new Path(storeDir)
    val fs = fsOf(s, root)
    fs.mkdirs(root)
    val next = gens.lastOption.map(_.k).getOrElse(0L) + 1
    val staging = new Path(root, s".staging-$next")
    ev.withColumn("event_date", to_date(col("ts")))
      // one file per day: the fixture's day is small; a production
      // deployment sizes files via maxRecordsPerFile instead
      .repartition(col("event_date"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("event_date").parquet(staging.toString)
    val pub = new Path(root, s"gen=${next}__n=${n}__fp=${java.lang.Long.toHexString(fp)}")
    require(fs.rename(staging, pub), s"DateStore: could not publish $pub")
    gens.dropRight(1).foreach { g =>
      fs.rename(g.path, new Path(root, "." + g.path.getName + ".retired"))
    }
    true
  }

  /** The newest generation's partitioned table — `event_date` comes back
    * as a DATE partition column, so filters on it prune at file-listing
    * time (`PruneFileSourcePartitions`), before any row is read.
    */
  def readEvents(s: SparkSession, storeDir: String): DataFrame = {
    val gens = listGens(s, storeDir)
    require(gens.nonEmpty, s"DateStore: no published generation under $storeDir")
    s.read.parquet(gens.last.path.toString)
  }

  /** The pruned scan [[s11DateRollup]] aggregates — exposed so PlanSpec
    * pins `selectedPartitions` on the exact frame the query reads.
    */
  private[graft] def rollupScan(s: SparkSession, storeDir: String): DataFrame =
    readEvents(s, storeDir)
      .filter(col("event_date").between(lit("2024-01-08"), lit("2024-01-14")))

  /** S11 — the date-ranged daily rollup over the partition-pruned store
    * scan: one ISO week of a 30-day table, so the scan must touch 7 of
    * the 30 date partitions. Oracle: the same rollup computed from the
    * fixture events table directly — write → pruned read → aggregate
    * equals the source aggregate, hash-exactly.
    */
  def s11DateRollup(s: SparkSession, dir: String): DataFrame = {
    val store = defaultStoreDir(dir)
    ensureCurrent(s, dir, store)
    rollupScan(s, store)
      .groupBy(col("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Exact.dsum(col("value")).as("sum_value"))
      .orderBy("event_date", "event_type")
  }

  val s11DateRollupSql: String =
    """SELECT CAST(ts AS DATE) AS event_date, event_type,
      |  count(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
