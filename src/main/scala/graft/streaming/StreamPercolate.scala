package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.TextAnalysis

/** Standing-query percolation as a STREAM stage — the prospective-
  * search/alerting shape (stored queries, arriving documents): every
  * micro-batch is tokenized and matched against the whole broadcast
  * query dictionary by the same conjunctive-containment operator the
  * batch census (q289) runs. Matching is per-document, so running it
  * inside foreachBatch makes stream ≡ batch hold by construction —
  * no state store, no watermark, alert-sized output per batch
  * (spec-proven across batch boundaries in StreamCurationSpec).
  */
object StreamPercolate {

  /** (query_id, doc_id) alert pairs for one batch of documents. */
  def alerts(docs: DataFrame,
      queries: Seq[(String, Seq[String])] = TextAnalysis.PercolatorQueries): DataFrame =
    TextAnalysis.percolateMatches(TextAnalysis.positionalPostings(docs), queries)

  /** PHRASE alert pairs — the match_phrase percolator per micro-batch
    * (ordered adjacency, same per-document stream ≡ batch argument).
    */
  def phraseAlerts(docs: DataFrame,
      phrases: Seq[(String, Seq[String])] = TextAnalysis.PercolatorPhrases): DataFrame =
    TextAnalysis.percolatePhrases(TextAnalysis.positionalPostings(docs), phrases)

  /** QUERIES-AS-DATA alerts per micro-batch: the standing-query set is
    * a (query_id, term) TABLE frozen at stream start (stream-static
    * join, the q184/knGate discipline) — production updates the table
    * and restarts the query, never redeploys code. Matching stays
    * per-document, so stream ≡ batch holds across any batch split
    * (spec-proven in StreamCurationSpec).
    */
  def tableAlerts(docs: DataFrame, queryTerms: DataFrame): DataFrame =
    TextAnalysis.percolateMatchesTable(
      TextAnalysis.positionalPostings(docs), queryTerms)
}
