package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal-column plumbing: opaque `binary` payloads + typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked DETERMINISTIC FAKE — it derives "image" properties
  * arithmetically from the raw bytes. Everything around it is the real
  * Spark shape a production decode has:
  *  - payloads travel as `BinaryType` columns (never strings),
  *  - decode runs via `mapPartitions` over an explicit row schema —
  *    one codec init per PARTITION, not per row (the thing that matters
  *    when the real decoder is libjpeg/ffmpeg),
  *  - output is a typed struct column; downstream stays columnar.
  * Swapping in a real decoder changes only the body of `decodeStub`.
  *
  * The oracle recomputes the same arithmetic from the text in DuckDB —
  * so the binary round-trip (string -> utf8 bytes -> features) is
  * verified end-to-end, not just "rows > 0".
  */
object MultimodalOps {

  type Q = (SparkSession, String) => DataFrame

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false)))

  /** ??? real decoder goes here — deterministic fake for CI. Derives
    * fake image dims + a mean-pixel feature from the payload bytes. */
  private def decodeStub(docId: Long, bytes: Array[Byte]): Row = {
    val n = bytes.length
    var sum = 0L
    var i = 0
    while (i < n) { sum += bytes(i) & 0xff; i += 1 }
    Row(docId, n, n % 640, (bytes(0) & 0xff) % 480, 3,
      sum.toDouble / n)
  }

  /** Binary ingest + partition-wise decode. At scale the repartition
    * count follows payload bytes per partition, not row count. */
  def decodeImages(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val payloads = docs.select(col("doc_id"),
      col("text").cast("binary").as("payload"))
    val rows = payloads.rdd.mapPartitions { it =>
      // real pipeline: init codec once here, per partition
      it.map(r => decodeStub(r.getLong(0), r.getAs[Array[Byte]](1)))
    }
    spark.createDataFrame(rows, decodedSchema)
  }

  val queries: Map[String, Q] = Map(
    // Decode + feature-extract over binary payloads, then a relational
    // rollup of the extracted features (decode feeds Catalyst land).
    "q50_multimodal_decode" -> ((s, d) => {
      decodeImages(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
          col("channels"), round(col("mean_byte"), 6).as("mean_byte"))
    }),
    "q51_multimodal_agg" -> ((s, d) => {
      decodeImages(Tables.load(s, d, "documents"))
        .groupBy(floor(col("n_bytes") / 100).cast("int").as("size_bucket"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("mean_byte")), 6).as("avg_mean_byte"),
          max(col("width")).as("max_width"))
    })
  )

  val oracles: Map[String, String] = Map(
    // documents text is ASCII, so utf-8 byte i == code point of char i —
    // the oracle recomputes the stub's byte math from the string side.
    "q50_multimodal_decode" ->
      """WITH f AS (
        |  SELECT doc_id, octet_length(encode(text))::INT AS n,
        |    list_sum([ascii(text[i:i]) for i in range(1, len(text)+1)])::DOUBLE
        |      / octet_length(encode(text)) AS mean_byte,
        |    ascii(text[1:1]) % 480 AS height
        |  FROM documents
        |)
        |SELECT doc_id, n AS n_bytes, n % 640 AS width, height,
        |  3 AS channels, round(mean_byte, 6) AS mean_byte
        |FROM f""".stripMargin,
    "q51_multimodal_agg" ->
      """WITH f AS (
        |  SELECT doc_id, octet_length(encode(text))::INT AS n,
        |    list_sum([ascii(text[i:i]) for i in range(1, len(text)+1)])::DOUBLE
        |      / octet_length(encode(text)) AS mean_byte
        |  FROM documents
        |)
        |SELECT floor(n / 100)::INT AS size_bucket, count(*) AS n,
        |  round(avg(mean_byte), 6) AS avg_mean_byte,
        |  max(n % 640) AS max_width
        |FROM f GROUP BY 1""".stripMargin
  )
}
