package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables

/** [EXT] Multimodal + nested-column operators (SURVEY.md §2.7 X5).
  *
  * Media payloads are opaque `binary` columns with typed metadata —
  * the 100 TB pattern: never parse media in SQL expressions; run the
  * decoder per partition over batched rows (the Scala analogue of
  * `mapInPandas`), keep the schema explicit, and let everything before
  * and after the decode stage stay in Catalyst. The decode kernel itself
  * is a STUB here (no image/audio libraries in the container — clearly
  * marked below); it computes deterministic features of the bytes so the
  * plumbing (schema, batching, partition parallelism) is fully testable
  * and oracle-checkable.
  */
object Multimodal {

  /** X5a — nested columns + higher-order functions: per-customer ordered
    * array of order prices (struct-sorted for determinism), filtered and
    * reduced with array HOFs. One shuffle (the groupBy); the HOF stage is
    * a narrow map over the built arrays.
    */
  def x5Nested(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(sort_array(collect_list(struct(col("o_orderkey"), col("o_totalprice")))).as("ord"))
      .select(
        col("o_custkey"),
        expr("transform(ord, x -> x.o_totalprice)").as("prices"))
      .select(
        col("o_custkey"),
        size(col("prices")).as("n_orders"),
        array_max(col("prices")).as("max_price"),
        element_at(col("prices"), 1).as("first_price"),
        size(expr("filter(prices, p -> p > 100000.0)")).as("n_big"),
        round(expr(
          "aggregate(filter(prices, p -> p > 100000.0), 0D, (acc, p) -> acc + p)"), 2).as("big_total"))
      .orderBy("o_custkey")

  val x5NestedSql: String =
    """WITH nested AS (
      |  SELECT o_custkey, list(o_totalprice ORDER BY o_orderkey) AS prices
      |  FROM orders GROUP BY o_custkey)
      |SELECT o_custkey,
      |  CAST(len(prices) AS INTEGER) AS n_orders,
      |  list_max(prices) AS max_price,
      |  prices[1] AS first_price,
      |  CAST(len(list_filter(prices, p -> p > 100000.0)) AS INTEGER) AS n_big,
      |  round(list_reduce(list_prepend(0.0::DOUBLE, list_filter(prices, p -> p > 100000.0)),
      |                    (acc, p) -> acc + p), 2) AS big_total
      |FROM nested ORDER BY o_custkey""".stripMargin

  /** Output schema of the decode stage — explicit, never inferred. */
  val mediaFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("byte_len", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("checksum", LongType)))

  /** ======================== DECODE STUB ==============================
    * Stand-in for the real media decoder (image resize / audio feature /
    * video frame-sample). The container ships no media libraries, so this
    * computes deterministic byte-level features with the exact same
    * signature a real kernel would have: Iterator[Row] → Iterator[Row],
    * batched per partition, no driver involvement. Swap the body for
    * JNI/FFmpeg/JPEG decode in production — nothing else changes.
    * ===================================================================
    */
  private def decodeStub(rows: Iterator[Row]): Iterator[Row] =
    rows.map { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val checksum = bytes.take(16).foldLeft(0L)((acc, b) => acc + (b & 0xff))
      Row(id, bytes.length, bytes.length / 64 + 1, checksum)
    }

  /** X5b — media feature extraction over binary columns via
    * mapPartitions (the Scala analogue of a batched Pandas UDF /
    * mapInPandas stage). The binary payload here is the UTF-8 encoding of
    * `text` (the fixtures carry no real media), which keeps the whole
    * stage oracle-checkable byte-for-byte.
    */
  def x5MediaFeatures(s: SparkSession, dir: String): DataFrame = {
    val media = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val out = media.sparkSession.createDataFrame(
      media.rdd.mapPartitions(decodeStub), mediaFeatureSchema)
    out.orderBy("doc_id")
  }

  val x5MediaSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
      |  CAST(octet_length(encode(text)) // 64 + 1 AS INTEGER) AS n_frames,
      |  list_reduce(list_prepend(0::BIGINT,
      |      [ascii(text[i]) for i in range(1, least(length(text), 16) + 1)]),
      |    (acc, c) -> acc + c) AS checksum
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Output schema of the resize stage: payload plus a typed metadata
    * struct — the "opaque binary + typed metadata" shape multimodal
    * columns keep at 100 TB (never parse media in SQL expressions; all
    * schema knowledge lives in the metadata struct).
    */
  val resizedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType))))))

  /** ======================== RESIZE STUB ==============================
    * Stand-in for a real image resize kernel (JPEG decode → bilinear
    * half-scale → re-encode). Deterministic byte-level half-scale: keep
    * every other byte per row of a width×height byte raster; metadata
    * struct updated to the new dimensions. Same contract as a production
    * kernel: Iterator[Row] → Iterator[Row], batched per partition.
    * ===================================================================
    */
  private def resizeStub(rows: Iterator[Row]): Iterator[Row] =
    rows.map { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val meta = r.getStruct(2)
      val (w, h, c) = (meta.getInt(0), meta.getInt(1), meta.getInt(2))
      val nw = math.max(1, w / 2)
      val nh = math.max(1, h / 2)
      val out = Array.tabulate(math.min(nw * nh * c, (bytes.length + 3) / 4))(i =>
        bytes(math.min(i * 4, bytes.length - 1)))
      Row(id, out, Row(nw, nh, c))
    }

  /** X5d — image-style resize over binary payloads with a typed metadata
    * struct carried through the stage. The payload is the UTF-8 text
    * bytes laid out as a 64-wide raster (fixtures carry no real images);
    * the metadata struct is computed in Catalyst, the kernel runs via
    * mapPartitions (the Scala analogue of a batched `mapInPandas` stage),
    * and the output schema is explicit.
    *
    * Oracle-checkable INCLUDING the bytes: the stub's output byte `i` is
    * input byte `min(4i, len−1)`, and fixture text is ASCII, so the
    * oracle rebuilds the selected characters as a string and md5s it —
    * the same portability move as `x2_simhash_portable`. The md5 column
    * therefore pins the kernel's exact byte product, not just its
    * dimensions.
    */
  def x5Resize(s: SparkSession, dir: String): DataFrame = {
    val media = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .withColumn("meta", struct(
        lit(64).as("width"),
        (ceil(octet_length(col("payload")) / 64.0)).cast("int").as("height"),
        lit(1).as("channels")))
    media.sparkSession.createDataFrame(
      media.rdd.mapPartitions(resizeStub), resizedSchema)
      .select(col("doc_id"), octet_length(col("payload")).as("resized_len"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        md5(col("payload")).as("payload_md5"))
      .orderBy("doc_id")
  }

  /** DuckDB twin of [[x5Resize]]: pure arithmetic for the dimensions and
    * a character-rebuild + md5 for the byte product (ASCII fixture:
    * char == byte; `text[i]` is 1-based, the stub's index is 0-based).
    */
  val x5ResizeSql: String =
    """WITH m AS (
      |  SELECT doc_id, text, strlen(text) AS len,
      |    greatest(1, CAST(ceil(strlen(text) / 64.0) AS BIGINT) // 2) AS nh
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, text, len, nh,
      |    least(32 * nh, (len + 3) // 4) AS out_len
      |  FROM m)
      |SELECT doc_id, CAST(out_len AS INTEGER) AS resized_len,
      |  32 AS width, CAST(nh AS INTEGER) AS height,
      |  md5(array_to_string(
      |    [text[least(i * 4 + 1, len)] for i in range(0, out_len)], '')) AS payload_md5
      |FROM r ORDER BY doc_id""".stripMargin

  /** X5c — frame sampling over a video-like binary payload, fully
    * declarative: the payload is a sequence of fixed-size frames
    * (64 bytes); every 4th frame is sampled and fingerprinted
    * (sha2-256). No imperative kernel at all — `sequence` generates the
    * sampled frame index space, `substring` slices the payload,
    * `posexplode` emits one row per sampled frame. At 100 TB this is a
    * narrow map + generate: no shuffle until the final presentation sort,
    * and the real decoder (FFmpeg keyframe extraction) would slot into
    * the same (doc_id, frame_no, fingerprint) contract via mapPartitions
    * exactly like [[x5MediaFeatures]]'s stub.
    */
  def x5FrameSample(s: SparkSession, dir: String): DataFrame = {
    val frameLen = 64 // frame = 64-char slice (fixture text is ASCII: char == byte)
    val stride = 4 // sample every 4th frame
    Tables.documents(s, dir)
      // an empty text holds zero frames: without this guard Spark's
      // floor((0-1)/256) = -1 makes sequence(0,-1) count DOWN to [0,-1]
      // (two phantom frames of the empty slice) while the DuckDB twin's
      // range(0, 0) is empty — a latent oracle divergence armed by any
      // future fixture with an empty document
      .filter(length(col("text")) > 0)
      .select(col("doc_id"),
        posexplode(expr(
          s"""transform(
             |  sequence(0, int(floor((length(text) - 1) / ${frameLen * stride}))),
             |  i -> sha2(encode(substring(text, i * ${frameLen * stride} + 1, $frameLen), 'UTF-8'), 256))""".stripMargin))
          .as(Seq("sample_no", "frame_sha")))
      .select(col("doc_id"), col("sample_no").cast("int").as("sample_no"), col("frame_sha"))
      .orderBy("doc_id", "sample_no")
  }

  val x5FrameSampleSql: String =
    """SELECT doc_id, CAST(i AS INTEGER) AS sample_no,
      |  sha256(substring(text, CAST(i * 256 + 1 AS BIGINT), 64)) AS frame_sha
      |FROM documents,
      |  LATERAL (SELECT unnest(range(0, (length(text) - 1) // 256 + 1)) AS i)
      |ORDER BY doc_id, sample_no""".stripMargin
}
