package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.operators.Dedup
import graft.warehouse.IndexStore

/** The substring-dedup gram set as a SELF-MAINTAINING streaming index —
  * the third IndexStore family beside the postings and IVF-lists
  * stores: every arriving micro-batch is first SCRUBBED against the
  * store as of before it ([[Dedup.substringGate]] — nothing the corpus
  * already contains survives ingestion), and its own gram set is then
  * absorbed as an `IndexStore` fragment, so later batches are gated
  * against everything that came before. Gate-then-absorb is the
  * production shape of the Lee et al. cleaning at ingest time:
  * the dedup index grows with the corpus it protects.
  *
  * foreachBatch is the right tool (the StreamPostings reasoning): the
  * gate + gram extraction are per-batch bounded computations with no
  * cross-batch STATE beyond the store itself, which lives on disk with
  * IndexStore's idempotent `batch_id=<id>` fragment discipline —
  * a crash-replayed batch overwrites its own fragment and re-emits the
  * same gate verdicts (the serving read as of before the batch is
  * unchanged, because its own fragment is excluded by construction).
  *
  * Set semantics make duplicate gram rows across fragments harmless
  * (the gate joins by key — a semi-join), so fragments don't anti-join
  * the base before writing and the shared IndexStore.compact carries
  * any cross-fragment repeats forward unchanged (a set-dedupe would be
  * one .distinct() on the snapshot; left out to keep compact()
  * generic). Gram keys are not doc-owned (a gram is shared
  * by every doc containing it), so per-doc tombstones don't apply to
  * this family — erasing documents from the protected corpus means
  * rebuilding the gram set from the survivors (a writeBase/compact
  * from the surviving corpus), not anti-joining keys.
  */
object StreamGramSet {

  val GramSchema: StructType = StructType(Seq(StructField("gk", StringType)))

  /** Scrub one batch against the store's CURRENT serving read and
    * absorb its grams as fragment `batchId`. Returns the gate census
    * (the same frame the batch-side q302 operator emits). Shared by
    * the streaming sink and batch-side callers, so stream ≡ batch is
    * structural.
    */
  def gateAndAbsorb(batch: DataFrame, root: String, batchId: Long): DataFrame = {
    val s = batch.sparkSession
    // the store AS OF BEFORE this batch: bound the fragment view below
    // batchId, so a crash-replayed batch that already half-wrote its
    // own fragment (or raced a later one) re-derives the SAME verdicts
    val verdicts = Dedup.substringGate(batch,
      IndexStore.read(s, root, GramSchema, maxFragmentId = batchId - 1))
    IndexStore.addFragment(Dedup.gramSet(batch), root, batchId)
    verdicts
  }

  /** The streaming sink: gate each micro-batch, hand the census to
    * `onBatch`, absorb the batch's grams.
    */
  def ingest(docs: DataFrame, root: String, checkpointDir: String)(
      onBatch: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) onBatch(gateAndAbsorb(batch, root, batchId), batchId)
      }
}
