package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.TextAnalysis

/** Streaming posting-index ingest — the streaming twin of the q260
  * incremental batch-maintenance path: arriving documents are tokenized
  * into positional postings per micro-batch and written under
  * `outDir/batch_id=<id>` (the StreamDhash idempotence discipline), so
  * the text index stays maintainable from a live document stream.
  *
  * Tokenization is a per-document posexplode with no cross-batch state
  * (a doc's postings depend only on that doc), so foreachBatch is the
  * right tool — not flatMapGroupsWithState: inside the hook each
  * micro-batch is a bounded DataFrame and the SAME batch operator
  * ([[TextAnalysis.positionalPostings]]) that builds the disk artifact
  * and that the DuckDB oracle re-derives runs on it unchanged, making
  * stream ≡ batch structural. Crash replay is idempotent: a batch
  * re-delivered after a failure between the sink write and the
  * checkpoint commit OVERWRITES its own `batch_id` directory instead of
  * appending duplicate postings (exactly-once output).
  *
  * At 100 TB the economics mirror q260: the pre-existing corpus is
  * never re-tokenized — each micro-batch pays O(batch) tokenization,
  * and serving queries over (base artifact ∪ stream directories) is a
  * plain multi-directory parquet scan with the query-term `In(word)`
  * filter pushed to every fragment.
  */
object StreamPostings {

  /** Write each micro-batch's postings (doc_id, pos, word) under
    * `outDir/batch_id=<batchId>` as parquet.
    */
  def ingest(docs: DataFrame, outDir: String,
      checkpointDir: String): DataStreamWriter[Row] = {
    // legacy-layout guard, through Hadoop's FileSystem API so it works
    // on any supported filesystem (java.io.File is local-only)
    BatchLayout.requireCleanRoot(docs.sparkSession, outDir)
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          TextAnalysis.positionalPostings(batch)
            .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        }
      }
  }

  /** Every stream-ingested posting (the batch_id partition column
    * dropped) — union with the base artifact to serve retrieval over
    * the full corpus, exactly like q260's (artifact ∪ delta). Before
    * the stream's first non-empty batch commits this returns an EMPTY
    * correctly-typed frame (ingest skips empty batches, so schema
    * inference would otherwise fail for a reader set up early).
    */
  def readPostings(spark: SparkSession, outDir: String): DataFrame =
    BatchLayout.readFragments(spark, outDir, PostingsSchema)

  /** (doc_id, pos, word) — [[TextAnalysis.positionalPostings]]'s shape. */
  val PostingsSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField("doc_id", LongType), StructField("pos", IntegerType),
      StructField("word", StringType)))
  }
}
