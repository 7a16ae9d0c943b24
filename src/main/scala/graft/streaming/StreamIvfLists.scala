package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Similarity

/** Streaming IVF-list ingest — the vector member of the streaming
  * index-maintenance family (StreamDhash media, StreamPostings text):
  * arriving embeddings are assigned per micro-batch against a FROZEN
  * coarse quantizer and written under `outDir/batch_id=<id>` (the
  * idempotent overwrite discipline), so the ANN index absorbs a live
  * vector stream with no rebuild and no cross-batch state.
  *
  * Assignment is per-vector independent given the quantizer (one
  * broadcast of nlist centroids, a struct-MAX per vector), so
  * foreachBatch runs the SAME batch operator
  * ([[Similarity.ivfAssignments]]) the disk artifact and the q264/q266
  * oracles derive from — stream ≡ batch is structural, and
  * (base lists ∪ stream directories) serves search exactly like q266's
  * (base ∪ delta). Crash replay overwrites the batch's own directory:
  * exactly-once output.
  *
  * At 100 TB the quantizer is the [[graft.warehouse.Materialized]]
  * artifact trained once on history; each micro-batch pays
  * O(batch × nlist) dot products and one parquet write — retrain
  * DUE-ness is the separate incrementalAssignment drift audit.
  */
object StreamIvfLists {

  /** Write each micro-batch's list rows (cand_id, ce, cn, cent_id)
    * under `outDir/batch_id=<batchId>` as parquet.
    */
  def ingest(vecs: DataFrame, quantizer: DataFrame, outDir: String,
      checkpointDir: String): DataStreamWriter[Row] = {
    // legacy-layout guard, through Hadoop's FileSystem API so it works
    // on any supported filesystem (java.io.File is local-only)
    BatchLayout.requireCleanRoot(vecs.sparkSession, outDir)
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          Similarity.ivfAssignments(batch, quantizer)
            .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        }
      }
  }

  /** Every stream-ingested list row (batch_id partition dropped) —
    * union with the base lists artifact to serve ANN search over the
    * full corpus, exactly like q266's (base ∪ delta). Before the
    * stream's first non-empty batch commits this returns an EMPTY
    * correctly-typed frame (ingest skips empty batches, so schema
    * inference would otherwise fail for a reader set up early).
    */
  def readLists(spark: SparkSession, outDir: String): DataFrame =
    BatchLayout.readFragments(spark, outDir, ListsSchema)

  /** (cent_id, cand_id, ce, cn) — [[Similarity.ivfAssignments]]'s shape
    * in the list-serving column order.
    */
  val ListsSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("cent_id", LongType), StructField("cand_id", LongType),
      StructField("ce", ArrayType(FloatType)), StructField("cn", DoubleType)))
  }
}
