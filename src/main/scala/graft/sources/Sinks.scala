package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sink surface (SURVEY.md §2.5 L1–L8).
  *
  * The reference's sinks are local files, a SQLite table replaced per run,
  * Mongo collections (append / keyed upsert) and Kafka topics; here each
  * is a partition-parallel DataFrameWriter against a directory-backed
  * store, so every write scales with the cluster instead of a single
  * client connection.
  */
object Sinks {

  /** L1 — CSV file sink, header, no index column
    * (ref: to_csv(index=False), dags/etl_data_pipeline.py:24).
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** L2 — JSON-records sink (ref: to_json(orient="records"),
    * dags/etl_data_pipeline_mongodb.py:24).
    */
  def writeJsonRecords(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** L3 — relational table sink, full replace (ref: to_sql(if_exists="replace"),
    * dags/etl_data_pipeline.py:32-33). Parquet directory = the table.
    */
  def replaceTable(df: DataFrame, tablePath: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(tablePath)

  /** L4 — document append sink (ref: insert_many,
    * dags/etl_data_pipeline_mongodb.py:38).
    */
  def appendDocuments(df: DataFrame, collectionPath: String): Unit =
    df.write.mode(SaveMode.Append).parquet(collectionPath)

  /** L5 — keyed upsert, last write wins per key in offset order
    * (ref: update_one(upsert=True), dags/kafka_to_mongo_pipeline_enchanced.py:141-145;
    * tie-break note SURVEY.md N3). Batch form; the streaming form is
    * [[graft.streaming.Streams.upsertSink]].
    */
  def upsertByKey(incoming: DataFrame, key: String, offsetCol: String, storePath: String): Unit = {
    val spark = incoming.sparkSession
    val w = Window.partitionBy(col(key)).orderBy(col(offsetCol).desc)
    val latest = incoming.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val existing =
      try spark.read.parquet(storePath)
      catch { case _: Throwable =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], latest.schema) }
    val merged = existing.join(latest.select(col(key)), Seq(key), "left_anti")
      .unionByName(latest)
    val staged = merged.cache()
    staged.count() // materialize before overwriting the input store
    staged.write.mode(SaveMode.Overwrite).parquet(storePath)
    staged.unpersist()
  }

  /** L6/L7 — producer sink: record → JSON value (ref: producer.send with
    * json.dumps serializer, dags/kafka_to_mongo_pipeline.py:41-46). The
    * file-backed "topic" carries the same (value) column a Kafka sink
    * takes; swap `.text(dir)` for `.format("kafka")` on a real broker.
    */
  def produceJson(df: DataFrame, topicDir: String): Unit =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
      .write.mode(SaveMode.Append).text(topicDir)

  /** L8 — notification "sink": the engine-side analogue of EmailOperator
    * is a driver-side templated report after the query completes
    * (ref: dags/etl_data_pipeline_mongodb_complex.py:129-135). Returns the
    * rendered body; delivery is deployment-specific.
    */
  def renderNotification(subject: String, counts: Map[String, Long]): String = {
    val rows = counts.toSeq.sortBy(_._1)
      .map { case (k, v) => s"<tr><td>$k</td><td>$v</td></tr>" }.mkString
    s"<html><body><h3>$subject</h3><table>$rows</table></body></html>"
  }
}
