package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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
  *
  * The payload-level surface (magic-number modality sniffing, prefix
  * byte-histogram entropy, binary exact dedup, resize planning, frame
  * sampling) operates on the BYTES, never a decoded object: every step
  * is a codegen'd binary expression, so the whole family runs at scan
  * speed with no codec in the loop — the triage pass a 100 TB mixed
  * crawl runs before deciding what is worth decoding. [[ModalityTags]]
  * uses 4-byte ASCII stand-ins (testdata payloads are printable ASCII,
  * which keeps the DuckDB oracle byte-exact); a production table swaps
  * in the real magic constants (\x89PNG, \xFF\xD8\xFF, RIFF, ftyp) —
  * the detection plumbing is identical.
  */
object Multimodal {

  /** (modality, 4-byte magic tag). Order is the detection order. */
  val ModalityTags: Seq[(String, String)] = Seq(
    "image/png" -> "PNG0",
    "image/jpeg" -> "JPG0",
    "audio/wav" -> "WAV0",
    "video/mp4" -> "MP40")

  /** Deterministic modality assignment for the synthetic corpus: stable
    * md5 bucket of the doc id over the four tagged modalities plus an
    * UNTAGGED fifth (exercises the detection fallback). The oracle
    * replays the same rule.
    */
  def modalityIndex(docId: Column): Column =
    graft.functions.Hashes.md5Long32(docId.cast("string")) % (ModalityTags.size + 1)

  /** Binary payload with the assigned modality's magic tag prepended
    * (index == size → no tag: a bare text payload).
    */
  def withMagicPayload(docs: DataFrame): DataFrame = {
    val idx = modalityIndex(col("doc_id"))
    val tag = ModalityTags.zipWithIndex.foldLeft(lit("")) { case (els, ((_, t), i)) =>
      when(idx === i, lit(t)).otherwise(els)
    }
    docs.withColumn("payload", concat(tag, col("text")).cast("binary"))
  }

  /** Magic-number sniffing over the payload bytes: match the 4-byte
    * prefix against [[ModalityTags]], fall back to text/plain. Pure
    * codegen'd binary substring + CASE — no decode, no UDF.
    */
  def detectModality(payload: Column): Column = {
    val prefix = substring(payload, 1, 4).cast("string")
    ModalityTags.foldLeft(lit("text/plain")) { case (els, (m, t)) =>
      when(prefix === lit(t), lit(m)).otherwise(els)
    }
  }

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

  /** DuckDB oracle fragments — ASCII payloads make string arithmetic ≡
    * byte arithmetic, so the oracle replays the binary plumbing on
    * VARCHARs.
    */
  object O {
    import graft.functions.Hashes

    /** CTE pair `p(doc_id, payload)`, `m(doc_id, modality, payload)`:
      * the bit-identical twin of withMagicPayload ∘ detectModality.
      */
    def payloadCtes: String = {
      val idx = s"(${Hashes.O.md5Long32("CAST(doc_id AS VARCHAR)")} % ${ModalityTags.size + 1})"
      val tag = ModalityTags.zipWithIndex
        .map { case ((_, t), i) => s"WHEN $idx = $i THEN '$t'" }
        .mkString("CASE ", " ", " ELSE '' END")
      val det = ModalityTags
        .map { case (m, t) => s"WHEN substring(payload, 1, 4) = '$t' THEN '$m'" }
        .mkString("CASE ", " ", " ELSE 'text/plain' END")
      s"""p AS (SELECT doc_id, ($tag || text) AS payload FROM documents),
         |m AS (SELECT doc_id, ($det) AS modality, payload FROM p)""".stripMargin
    }

    /** The decodeStub checksum as a sequential DuckDB fold (plain
      * BIGINT accumulator — safe from the struct-lambda leak).
      */
    def checksum(text: String): String =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |  list_transform(range(1, length($text) + 1), i -> CAST(ord($text[i]) AS BIGINT))),
         |  (a, b) -> (a * 31 + b) % 1000000007)""".stripMargin
  }
}
