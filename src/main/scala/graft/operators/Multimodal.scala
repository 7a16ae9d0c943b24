package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, decoded/feature-extracted per partition.
  *
  * The decode step is STUBBED (this container has no image/audio codecs):
  * `decodeStub` derives deterministic fake metadata from the payload
  * bytes. Everything around it is the real Spark shape a production
  * pipeline needs — binary column + struct metadata schema, a
  * mapPartitions boundary where a codec library would be initialized
  * once per partition (the Scala analog of mapInPandas batch decoding),
  * and downstream relational ops over the extracted features.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, source: String, payload: Array[Byte])
  case class MediaFeatures(
      doc_id: Long,
      source: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      checksum: Long)

  /** Attach a binary payload column (here: utf8 text bytes standing in
    * for encoded media).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", col("text").cast("binary"))

  /** Expression-only metadata extraction (codegen'd; used by the oracle-
    * checked query). Deterministic function of payload size.
    */
  def withMediaMeta(docs: DataFrame): DataFrame = {
    val n = octet_length(col("text"))
    docs
      .withColumn("n_bytes", n.cast("long"))
      .withColumn("width", (lit(64) + (n * 7) % 192).cast("int"))
      .withColumn("height", (lit(64) + (n * 13) % 128).cast("int"))
      .withColumn("n_frames", (lit(1) + n % 8).cast("int"))
  }

  /** Partition-wise decode stub over the typed Dataset boundary — where a
    * real codec would run (init once per partition, batch decode). The
    * fake decode must agree with withMediaMeta so both paths are testable
    * against each other.
    */
  def decodeStub(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real pipeline: val codec = Codec.init() // once per partition
      rows.map { r =>
        val n = r.payload.length
        MediaFeatures(
          doc_id = r.doc_id,
          source = r.source,
          n_bytes = n.toLong,
          width = 64 + (n * 7) % 192,
          height = 64 + (n * 13) % 128,
          n_frames = 1 + n % 8,
          checksum = r.payload.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L))
      }
    }
  }

  def toMediaRows(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    withPayload(docs).select(col("doc_id"), col("source"), col("payload")).as[MediaRow]
  }

  /** Frame sampling: one output row per sampled frame (every `stride`-th
    * index in [0, n_frames)), via a generator — the explode distributes
    * with the data, no driver loop, and the downstream shuffle key can
    * include frame_idx for per-frame parallelism. `frame_bytes` is a
    * fixed-width byte slice of the payload standing in for the decoded
    * frame buffer (this container ships no codecs).
    */
  def sampleFrames(docs: DataFrame, stride: Int = 3, frameBytes: Int = 8): DataFrame =
    withMediaMeta(withPayload(docs))
      .withColumn("frame_idx", explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .withColumn("frame_bytes",
        substring(col("payload"), lit(1) + col("frame_idx") * frameBytes, lit(frameBytes)))
      .select("doc_id", "n_frames", "frame_idx", "frame_bytes")

  /** Resize stub: rescales the extracted dimensions so the longest edge
    * is at most `maxDim`, preserving aspect ratio (floor semantics —
    * mirrors what a real resampler reports). Pure integer/double
    * expression arithmetic; the pixel resample itself would live in the
    * decodeStub partition boundary.
    */
  def resizeMeta(features: DataFrame, maxDim: Int = 96): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    val scale = when(longest > maxDim, lit(maxDim.toDouble) / longest).otherwise(lit(1.0))
    features
      .withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }
}
