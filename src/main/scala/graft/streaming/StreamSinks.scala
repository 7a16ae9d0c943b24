package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Streaming sinks (S11-S12, T3-T8).
  *
  * The reference appends update-mode window re-emissions into a table
  * with PRIMARY KEY (window_start, device_id, device_type) — which would
  * violate the PK on the second emission of a window (SURVEY §7.4.1).
  * `parquetUpsert` fixes that semantic: each micro-batch MERGEs on the
  * key columns, batch rows winning over previously stored rows. On a
  * transactional table format (or JDBC) this becomes a real MERGE
  * statement; at 100 TB the rewrite is bounded by partitioning the store
  * on window_start so only touched partitions rewrite.
  */
object StreamSinks {

  /** foreachBatch upsert into a parquet directory keyed by `keyCols`.
    * Empty batches are skipped without triggering a second job
    * (reference double-counts: spark_streaming_consumer.py:230-231).
    */
  def parquetUpsert(df: DataFrame, outDir: String, keyCols: Seq[String],
      checkpointDir: String, triggerInterval: String = "5 seconds"): DataStreamWriter[Row] =
    df.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        upsertBatch(batch, outDir, keyCols)
      }

  /** The merge step, exposed for direct testing. */
  def upsertBatch(batch: DataFrame, outDir: String, keyCols: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val fresh = batch.persist()
    try {
      if (!fresh.isEmpty) {
        val merged =
          if (Files.exists(Paths.get(outDir))) {
            val existing = spark.read.parquet(outDir)
            val newKeys = fresh.select(keyCols.map(col): _*).distinct()
            existing.join(broadcast(newKeys), keyCols, "left_anti").unionByName(fresh)
          } else fresh
        // Two-phase write via a staging dir: the source of the merge is the
        // directory being replaced, so materialize first.
        val staging = outDir + ".staging"
        merged.write.mode(SaveMode.Overwrite).parquet(staging)
        spark.read.parquet(staging).write.mode(SaveMode.Overwrite).parquet(outDir)
      }
    } finally fresh.unpersist()
  }

  /** Plain append sink for raw validated events (S11 append branch). */
  def parquetAppend(df: DataFrame, outDir: String, checkpointDir: String,
      triggerInterval: String = "5 seconds"): DataStreamWriter[Row] =
    df.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerInterval))

  /** Console debug sink (S12). */
  def console(df: DataFrame, numRows: Int = 10): DataStreamWriter[Row] =
    df.writeStream.outputMode("append").format("console")
      .option("numRows", numRows).option("truncate", "false")
}
