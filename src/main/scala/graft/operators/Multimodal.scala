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

  // ---- perceptual near-dup fingerprint (dHash + banded Hamming LSH) ----

  val DHashGram = 4        // n-gram width feeding the intensity histogram
  val DHashBins = 72       // 8 rows × 9 cols — dHash's canonical grid
  val DHashMinChars = 72   // shorter payloads carry too little signal
  val DHashMaxHamming = 3  // pair threshold (bits of 64)
  val DHashBands = 8       // 8 bands × 8 bits: some band matches EXACTLY for any pair within Hamming 7
  val DHashBlockCap = 1000 // max docs per (band, value) block — GraphBlockCap discipline

  /** The deterministic decode stand-in for the dHash grid: a 72-bin
    * md5-hashed [[DHashGram]]-gram intensity histogram of the payload
    * bytes. A real image pipeline feeds dHash the 8×9 average-pooled
    * grayscale from the codec (the [[decodeStub]] mapPartitions
    * boundary); this container has no codecs, and a POSITIONAL pooling
    * of ASCII stand-in bytes is noise under the length-changing edits
    * the synthetic near-dups carry (measured: positional pooling puts
    * true near-dups at Hamming ≥ 12, indistinguishable from
    * background). The histogram "image" has the property the decoded
    * grayscale has for real re-encoded media — near-identical payloads
    * → near-identical 72-vector (true pairs land at Hamming 0–1,
    * background ≥ ~5 on this corpus) — so every downstream stage
    * (gradient-bit extraction, banding, blocked Hamming join) is
    * exercised exactly as production would run it.
    */
  def dhashPixels(text: Column): Column = {
    import graft.functions.Hashes
    val grams = transform(
      sequence(lit(1), length(text) - (DHashGram - 1)),
      i => (Hashes.md5Long32(text.substr(i, lit(DHashGram))) % DHashBins).cast("int"))
    transform(sequence(lit(0), lit(DHashBins - 1)),
      k => size(filter(grams, x => x === k)).cast("long"))
  }

  /** The dHash bit extraction (Krawetz's difference hash): bit (r,c) of
    * the 64-bit fingerprint is set iff pixel[r][c+1] > pixel[r][c] over
    * the 8-row × 9-column grid — 8 horizontal gradients per row. Pure
    * codegen'd element_at comparisons; bit 63 lands on the sign bit
    * (the hash is a BIT PATTERN: two's-complement value is irrelevant,
    * xor/bit_count below treat it as such).
    */
  private def dhashBits(pix: Column): Column =
    (0 until 64).map { b =>
      val r = b / 8
      val c = b % 8
      when(element_at(pix, r * 9 + c + 2) > element_at(pix, r * 9 + c + 1),
        shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** doc_id → 64-bit perceptual fingerprint, for payloads long enough
    * to pool. The pixel array materializes in its own projection so the
    * 128 element_at reads share one histogram computation.
    */
  def withDhash(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .filter(length(col(textCol)) >= DHashMinChars)
      .withColumn("__pix", dhashPixels(col(textCol)))
      .withColumn("dhash", dhashBits(col("__pix")))
      .drop("__pix")

  /** Perceptual near-dup pairs via multi-index Hamming LSH (the
    * image-dedup shape of the MinHash-band trick): each fingerprint
    * splits into [[DHashBands]] 8-bit bands; by pigeonhole, any pair
    * within Hamming 7 ≥ [[DHashMaxHamming]] matches at least one band
    * EXACTLY, so candidates come from equi-joins on (band, value) —
    * never an all-pairs scan. Blocks larger than [[DHashBlockCap]] are
    * dropped (a degenerate band value — e.g. a constant-intensity
    * region shared by everything — must not quadratically explode one
    * reducer; same discipline as [[Similarity.GraphBlockCap]]).
    * Verified pairs carry the exact 64-bit Hamming distance.
    */
  def dhashNearDupPairs(docs: DataFrame, maxHamming: Int = DHashMaxHamming,
      textCol: String = "text"): DataFrame = {
    val h = withDhash(docs, textCol).select(col("doc_id"), col("dhash"))
    val bands = h.select(col("doc_id"), col("dhash"),
      posexplode(array((0 until DHashBands).map(b =>
        shiftright(col("dhash"), 8 * b).bitwiseAND(lit(255L))): _*)).as(Seq("band", "bv")))
    val ok = bands.groupBy("band", "bv").agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= DHashBlockCap).select("band", "bv")
    val cand = bands.join(ok, Seq("band", "bv"))
    cand.as("a").join(cand.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.dhash").as("h1"), col("b.dhash").as("h2"))
      .distinct()
      .select(col("d1"), col("d2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .orderBy("d1", "d2")
  }

  /** DuckDB oracle fragments — ASCII payloads make string arithmetic ≡
    * byte arithmetic, so the oracle replays the binary plumbing on
    * VARCHARs.
    */
  object O {
    import graft.functions.Hashes

    /** Bit-identical twin of [[dhashNearDupPairs]] over `documents`.
      * Bit 63 is emitted as the Long.MinValue literal (DuckDB raises on
      * 1<<63); summing distinct powers of two never overflows — the
      * total IS the 64-bit pattern.
      */
    def dhashPairs(maxHamming: Int = DHashMaxHamming, cap: Int = DHashBlockCap): String = {
      val terms = (0 until 64).map { b =>
        val r = b / 8
        val c = b % 8
        val t = if (b == 63) "(-9223372036854775807 - 1)" else s"(1::BIGINT << $b)"
        s"CASE WHEN pix[${r * 9 + c + 2}] > pix[${r * 9 + c + 1}] THEN $t ELSE 0::BIGINT END"
      }.mkString(" + ")
      val gram = Hashes.O.md5Long32(s"substring(text, CAST(i AS INT), $DHashGram)")
      s"""WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) >= $DHashMinChars),
         |px AS MATERIALIZED (SELECT doc_id, list_transform(range(0, $DHashBins), k ->
         |    CAST(len(list_filter(gs, x -> x = k)) AS BIGINT)) AS pix
         |  FROM (SELECT doc_id, list_transform(range(1, length(text) - ${DHashGram - 2}),
         |    i -> $gram % $DHashBins) AS gs FROM d)),
         |hh AS MATERIALIZED (SELECT doc_id, ($terms) AS dhash FROM px),
         |bnd AS MATERIALIZED (SELECT doc_id, dhash, b AS band, (dhash >> (8 * b)) & 255 AS bv
         |  FROM hh CROSS JOIN (SELECT unnest(range(0, $DHashBands)) AS b)),
         |ok AS (SELECT band, bv FROM bnd GROUP BY band, bv HAVING COUNT(*) <= $cap),
         |cand AS MATERIALIZED (SELECT bnd.doc_id, bnd.dhash, bnd.band, bnd.bv
         |  FROM bnd JOIN ok USING (band, bv)),
         |pr AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2, a.dhash AS h1, b.dhash AS h2
         |  FROM cand a JOIN cand b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
         |SELECT d1, d2, CAST(bit_count(xor(h1, h2)) AS INT) AS hamming
         |FROM pr WHERE CAST(bit_count(xor(h1, h2)) AS INT) <= $maxHamming
         |ORDER BY d1, d2""".stripMargin
    }

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
