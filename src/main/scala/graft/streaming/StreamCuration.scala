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
}
