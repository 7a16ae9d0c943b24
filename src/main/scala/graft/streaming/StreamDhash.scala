package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Multimodal

/** Streaming twin of the q239 incremental perceptual-dedup shape: an
  * arriving document stream is fingerprinted and matched against a
  * STATIC persisted fingerprint index, per micro-batch.
  *
  * The fingerprint computation ([[Multimodal.withDhash]]) is a
  * position-row aggregation per document, so it cannot run as a plain
  * stateless projection on a stream — but it needs no CROSS-batch
  * state either (a doc's fingerprint depends only on that doc). That
  * makes foreachBatch the right tool, not flatMapGroupsWithState:
  * inside the hook each micro-batch is an ordinary bounded DataFrame,
  * the full batch operator pipeline (explode → histogram → banded
  * block-capped join against the index) runs on it unchanged, and the
  * stream≡batch parity is structural — both paths execute the SAME
  * operator code. State stays bounded by construction: nothing
  * persists between batches except the (static, disk-backed) index.
  *
  * At 100 TB the index side is the [[graft.warehouse.Materialized]]
  * disk artifact: banded once, block-capped on the INDEX side, so an
  * ingest batch costs O(batch × bands) lookups however large the
  * corpus index grows — see [[Multimodal.dhashIndexMatches]].
  */
object StreamDhash {

  /** Write each micro-batch's match rows (doc_id, n_matches,
    * min_hamming, best_match — see [[Multimodal.dhashIndexMatches]])
    * under `outDir/batch_id=<batchId>` as parquet. A doc's verdict
    * against a static index never changes, so per-batch output is
    * stable — and keying the directory on batchId makes crash replay
    * IDEMPOTENT (exactly-once output, not just at-least-once): a batch
    * re-delivered after a failure between the sink write and the
    * checkpoint commit OVERWRITES its own directory instead of
    * appending duplicate rows. Readers scan `outDir` and get batch_id
    * as a trailing partition column.
    */
  def matchAgainstIndex(docs: DataFrame, index: DataFrame, outDir: String,
      checkpointDir: String,
      maxHamming: Int = Multimodal.DHashMaxHamming): DataStreamWriter[Row] = {
    // a pre-round-11 sink appended data files at the ROOT of outDir;
    // mixing those with batch_id=<id> partition directories breaks
    // parquet partition discovery for every reader — refuse to write
    // into a legacy layout rather than corrupt it (Hadoop FS API, so
    // the guard also fires on hdfs:// and object stores)
    BatchLayout.requireCleanRoot(docs.sparkSession, outDir)
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          Multimodal.dhashIndexMatches(Multimodal.withDhash(batch), index, maxHamming)
            .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        }
      }
  }
}
