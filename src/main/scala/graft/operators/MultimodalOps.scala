package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: opaque `binary` payloads + typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked DETERMINISTIC FAKE — it derives "image" properties
  * arithmetically from the raw bytes. Everything around it is the real
  * Spark shape a production decode has:
  *  - payloads travel as `BinaryType` columns (never strings),
  *  - decode runs via typed `Dataset.mapPartitions` (Encoder-backed,
  *    stays in SQL land — no `.rdd` round-trip) — one codec init per
  *    PARTITION, not per row (the thing that matters when the real
  *    decoder is libjpeg/ffmpeg),
  *  - output is a typed struct column; downstream stays columnar.
  * Swapping in a real decoder changes only the body of `decodeStub`.
  *
  * The oracle recomputes the same arithmetic from the text in DuckDB —
  * so the binary round-trip (string -> utf8 bytes -> features) is
  * verified end-to-end, not just "rows > 0".
  */
object MultimodalOps {

  type Q = (SparkSession, String) => DataFrame

  /** Typed decode outputs: the Encoder keeps mapPartitions inside SQL
    * land (UnsafeRow in/out, AQE + codegen above and below) — no RDD
    * round-trip, no InternalRow -> Row -> InternalRow per row. */
  final case class Decoded(doc_id: Long, n_bytes: Int, width: Int,
      height: Int, channels: Int, mean_byte: Double)
  final case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Int,
      mean_byte: Double)
  final case class Resized(doc_id: Long, orig_bytes: Int,
      resized: Array[Byte], resized_bytes: Int, resized_mean: Double)

  /** ??? real decoder goes here — deterministic fake for CI. Derives
    * fake image dims + a mean-pixel feature from the payload bytes. */
  private def decodeStub(docId: Long, bytes: Array[Byte]): Decoded = {
    val n = bytes.length
    if (n == 0) return Decoded(docId, 0, 0, 0, 3, 0.0) // empty payload
    var sum = 0L
    var i = 0
    while (i < n) { sum += bytes(i) & 0xff; i += 1 }
    Decoded(docId, n, n % 640, (bytes(0) & 0xff) % 480, 3,
      sum.toDouble / n)
  }

  /** Binary ingest + partition-wise decode. At scale the repartition
    * count follows payload bytes per partition, not row count. */
  def decodeImages(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real pipeline: init codec once here, per partition
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }.toDF()
  }

  /** Frame sampling: treat the payload as a "video" of fixed-size
    * frames, keep every `stride`-th frame. One output row per sampled
    * frame with typed metadata + a per-frame feature — the exploded
    * (asset, frame) shape a video pipeline feeds to inference. The
    * frame "decode" is the same deterministic fake byte math. */
  def sampleFrames(docs: DataFrame, frameBytes: Int, stride: Int)
      : DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real pipeline: init the demuxer once per partition
        it.flatMap { case (id, bytes) =>
          val nFrames = bytes.length / frameBytes // full frames only
          (0 until nFrames by stride).iterator.map { f =>
            var sum = 0L
            var i = f * frameBytes
            val end = i + frameBytes
            while (i < end) { sum += bytes(i) & 0xff; i += 1 }
            Frame(id, f, frameBytes, sum.toDouble / frameBytes)
          }
        }
      }.toDF()
  }

  /** "Resize": stride-subsample the payload bytes (the fake analogue
    * of nearest-neighbor image downscaling) producing a new, smaller
    * binary payload + its metadata — binary-in/binary-out plumbing. */
  def resize(docs: DataFrame, stride: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val out = Array.range(0, bytes.length, stride).map(bytes(_))
          val mean =
            if (out.isEmpty) 0.0
            else out.map(_ & 0xff).map(_.toLong).sum.toDouble / out.length
          Resized(id, bytes.length, out, out.length, mean)
        }
      }.toDF()
  }

  val queries: Map[String, Q] = Map(
    // Resize (stride subsample) keeps binary in/out; oracle recomputes
    // the sampled-byte stats from the string side.
    "q54_resize" -> ((s, d) => {
      resize(Tables.load(s, d, "documents"), stride = 3)
        .select(col("doc_id"), col("orig_bytes"), col("resized_bytes"),
          round(col("resized_mean"), 6).as("resized_mean"))
    }),

    // Frame sampling over binary payloads: every 4th 16-byte "frame".
    "q52_frame_sample" -> ((s, d) => {
      sampleFrames(Tables.load(s, d, "documents"), frameBytes = 16,
          stride = 4)
        .select(col("doc_id"), col("frame_idx"), col("frame_bytes"),
          round(col("mean_byte"), 6).as("mean_byte"))
    }),

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
    "q54_resize" ->
      """WITH f AS (
        |  SELECT doc_id, len(text) AS n,
        |    [ascii(text[i+1:i+1]) for i in range(0, len(text), 3)] AS sampled
        |  FROM documents
        |)
        |SELECT doc_id, n AS orig_bytes, len(sampled) AS resized_bytes,
        |  round(list_sum(sampled)::DOUBLE / len(sampled), 6) AS resized_mean
        |FROM f""".stripMargin,
    "q52_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, len(text) AS n,
        |    unnest([i for i in range(0, len(text) // 16)]) AS frame_idx
        |  FROM documents
        |)
        |SELECT doc_id, frame_idx, 16 AS frame_bytes,
        |  round(list_sum([ascii(text[frame_idx*16 + j : frame_idx*16 + j])
        |    for j in range(1, 17)])::DOUBLE / 16, 6) AS mean_byte
        |FROM f JOIN documents USING (doc_id)
        |WHERE frame_idx % 4 = 0""".stripMargin,
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
