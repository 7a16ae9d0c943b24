package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Hashes, Text}
import graft.operators.Corpus

/** Streaming twin of [[graft.operators.Corpus.cdcChunks]] — the
  * content-defined chunker over a document STREAM.
  *
  * The batch operator deliberately uses the position-row + doc-keyed
  * window formulation (it pays the boundary md5 once per position and
  * inherits file parallelism), but non-time window functions are
  * unsupported on streaming DataFrames. Here each document is one row
  * and the whole chunking runs as narrow per-row ARRAY expressions —
  * exactly the shape Structured Streaming wants (stateless map, no
  * shuffle, chunk rows flow out with the micro-batch). The two
  * formulations are value-identical per document — same boundary rule
  * (md5 of the [[Corpus.CdcWindow]]-gram ending at position q, ≡ 0 mod
  * divisor), same chunk indexing, same chunk_md5 — which
  * StreamCdcSpec proves across micro-batch boundaries against the
  * batch operator.
  *
  * Because chunking is per-document, a document that arrives in one
  * micro-batch chunks identically no matter how the stream is sliced;
  * the upsert sink keyed on (doc_id, chunk_idx) makes a replayed
  * micro-batch idempotent.
  */
object StreamCdc {

  /** (doc_id, chunk_idx, start_word, n_words, chunk_md5) per document —
    * columns and values identical to [[Corpus.cdcChunks]]. Works on
    * both streaming and batch frames (the spec uses the batch side for
    * the parity oracle).
    */
  def chunkDocs(docs: DataFrame, divisor: Int = Corpus.CdcDivisor,
      textCol: String = "text"): DataFrame = {
    val w = col("w")
    // boundary AFTER position q (1-based): the CdcWindow-gram ending at
    // q hashes to 0 mod divisor (q >= CdcWindow guards the ramp-up; the
    // when() guards sequence()'s descending form on short docs). The
    // gram is DERIVED from CdcWindow, same as the batch lag chain, so
    // the two formulations cannot silently diverge.
    val bounds = when(size(w) >= Corpus.CdcWindow,
      filter(sequence(lit(Corpus.CdcWindow), size(w)), q =>
        Hashes.md5Long32(concat_ws(" ",
          ((Corpus.CdcWindow - 1) to 0 by -1).map(o => element_at(w, q - o)): _*))
          % divisor === 0))
      .otherwise(array().cast("array<int>"))
    // chunk k starts at word 1 (k = 0) or one past the k-th boundary; a
    // boundary on the last word opens no chunk (no words after it)
    val starts = filter(
      concat(array(lit(1)), transform(bounds, b => b + 1)),
      st => st <= size(w))
    docs
      .select(col("doc_id"), Text.words(col(textCol)).as("w"))
      .filter(size(w) > 0) // empty docs emit no chunk rows (batch parity)
      .withColumn("starts", starts)
      .select(col("doc_id"), w, col("starts"),
        posexplode(col("starts")).as(Seq("chunk_idx", "start_word")))
      .withColumn("next_start",
        when(col("chunk_idx") + 1 < size(col("starts")),
          element_at(col("starts"), col("chunk_idx") + 2))
          .otherwise(size(w) + 1))
      .select(
        col("doc_id"),
        col("chunk_idx").cast("int").as("chunk_idx"),
        col("start_word").cast("int").as("start_word"),
        (col("next_start") - col("start_word")).cast("int").as("n_words"),
        md5(array_join(
          slice(w, col("start_word"), col("next_start") - col("start_word")),
          " ")).as("chunk_md5"))
  }
}
