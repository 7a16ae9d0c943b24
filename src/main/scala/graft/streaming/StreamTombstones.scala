package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.warehouse.IndexStore

/** Streaming DELETION ingest — the erasure twin of the index ingest
  * family (StreamPostings text, StreamIvfLists vectors): tombstone KEYS
  * arriving on a stream (a GDPR erasure queue, a moderation feed) are
  * written per micro-batch under the store's `tombstones/batch_id=<id>`
  * directory — the same idempotent-overwrite discipline, so crash
  * replay can never erase twice or miss an erasure.
  *
  * Effect is immediate and layered exactly like the CDC shape:
  * [[IndexStore.read]] anti-joins the live tombstone table, so a key is
  * gone from serving the moment its micro-batch commits; the next
  * [[IndexStore.compact]] applies the erasure PHYSICALLY (the new
  * generation contains no tombstoned row). Tombstones stay until
  * [[IndexStore.purgeTombstones]] — a later fragment re-delivering an
  * erased key keeps losing the anti-join.
  */
object StreamTombstones {

  /** Write each micro-batch's keys under
    * `<root>/tombstones/batch_id=<batchId>`.
    */
  def ingest(keys: DataFrame, storeRoot: String,
      checkpointDir: String): DataStreamWriter[Row] = {
    BatchLayout.requireCleanRoot(keys.sparkSession, IndexStore.tombstonesDir(storeRoot))
    keys.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) IndexStore.addTombstones(batch, storeRoot, batchId)
      }
  }
}
