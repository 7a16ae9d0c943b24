package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Classifier, TextAnalysis}

/** The curation gate as a STREAM: Gopher rules plus the offline-trained
  * domain classifier applied to a live document feed — the online half
  * of the q177 batch pipeline (exact dedup stays batch-side or runs as
  * the watermark-bounded streaming dedup, StreamDedupJoin).
  *
  * Both signals are stateless narrow projections (codegen'd string
  * arithmetic + a literal 4-weight boundary), so the stream needs no
  * watermark, no state store, and no shuffle: at ingest scale every
  * micro-batch is map-only, and the SAME code path produces bit-equal
  * verdicts on a batch frame (spec-proven stream ≡ batch). Weights come
  * from [[graft.operators.Classifier.trainedWeights]] — the standard
  * train-offline / score-online split.
  */
object StreamCuration {

  /** Per-document verdict frame: Gopher rule flags + classifier score +
    * the combined `selected` gate. Works identically on streaming and
    * batch inputs (doc_id, text, source).
    */
  def curate(docs: DataFrame, weights: Array[Double]): DataFrame =
    TextAnalysis
      .gopherRules(
        Classifier.withScore(docs, weights),
        carry = Seq("source", "domain_score", "keep_domain"))
      .withColumn("selected", col("pass_gopher") && col("keep_domain"))
      .select("doc_id", "source", "n_words", "pass_gopher",
        "domain_score", "keep_domain", "selected")

  /** The KN-perplexity gate as a stream stage — the CCNet production
    * split (train the LM offline on the reference corpus, gate the
    * live feed forever): arriving docs are tokenized and scored
    * against the FROZEN [[TextAnalysis.KnModel]] via stream-static
    * joins of the micro-batch against the model's count tables, and
    * pass when the mean KN log-probability clears `minLogprob` (the
    * reference-likeness floor). Run inside foreachBatch (the per-doc
    * aggregation is batch-scoped: a doc never spans batches); the SAME
    * code path scores a batch frame, so stream ≡ batch is spec-proven
    * like the [[curate]] gate. Unlike [[curate]] this stage joins — but
    * only against the model tables, which are corpus-vocabulary-sized
    * and static (broadcastable at serving scale), never against other
    * stream rows: no state store, no watermark.
    */
  def knGate(docs: DataFrame, model: TextAnalysis.KnModel,
      minLogprob: Double): DataFrame = {
    val words = docs.select(col("doc_id"),
      graft.functions.Text.words(col("text")).as("w"))
    TextAnalysis.knScoreBigrams(TextAnalysis.docBigrams(words, pin = false), model)
      .withColumn("pass_kn", col("kn_avg_logprob") >= minLogprob)
  }

  /** Substring-dedup at INGEST (the Lee et al. cleaning as a stream
    * stage): every arriving document is scrubbed of windows whose
    * 8-gram the base corpus already contains — the frozen
    * [[graft.operators.Dedup.gramSet]] artifact joined stream-static
    * per micro-batch, exactly the [[knGate]] split (build the gram set
    * offline, gate the feed forever). No state store, no watermark, no
    * batch-vs-batch state; the SAME operator runs on a batch frame, so
    * stream ≡ batch is spec-provable.
    */
  def substringGate(docs: DataFrame, baseGrams: DataFrame): DataFrame =
    graft.operators.Dedup.substringGate(docs, baseGrams)
}
