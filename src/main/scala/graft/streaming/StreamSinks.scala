package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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

  /** The merge step, exposed for direct testing.
    *
    * Crash safety: each merge writes a NEW generation directory
    * (`gen-<n>`) and then atomically swaps the `_CURRENT` pointer file.
    * The previous generation is kept until the new one is fully
    * committed, so a crash at any point leaves a readable store — the
    * pointer either still names the old generation (partial new write is
    * invisible and gets overwritten on replay) or already names the
    * complete new one. Generations older than the immediate predecessor
    * are retired after the swap. On a real deployment this role is
    * played by a transactional table format's commit protocol.
    */
  def upsertBatch(batch: DataFrame, outDir: String, keyCols: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val fresh = batch.persist()
    try {
      if (!fresh.isEmpty) {
        val cur = currentGen(outDir)
        val merged = cur match {
          case Some(g) =>
            val existing = spark.read.parquet(genPath(outDir, g))
            val newKeys = fresh.select(keyCols.map(col): _*).distinct()
            existing.join(broadcast(newKeys), keyCols, "left_anti").unionByName(fresh)
          case None => fresh
        }
        val next = cur.map(_ + 1).getOrElse(0L)
        merged.write.mode(SaveMode.Overwrite).parquet(genPath(outDir, next))
        val tmp = Paths.get(outDir, "_CURRENT.tmp")
        Files.write(tmp, next.toString.getBytes(UTF_8))
        Files.move(tmp, Paths.get(outDir, "_CURRENT"),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        cur.filter(_ >= 1).foreach(g => deleteRecursively(genPath(outDir, g - 1)))
      }
    } finally fresh.unpersist()
  }

  /** Read the committed state of an upsert store (resolves `_CURRENT`). */
  def readStore(spark: SparkSession, outDir: String): DataFrame =
    currentGen(outDir) match {
      case Some(g) => spark.read.parquet(genPath(outDir, g))
      case None => throw new IllegalStateException(s"no committed generation under $outDir")
    }

  private def genPath(outDir: String, g: Long): String = s"$outDir/gen-$g"

  private def currentGen(outDir: String): Option[Long] = {
    val p = Paths.get(outDir, "_CURRENT")
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), UTF_8).trim.toLong) else None
  }

  private def deleteRecursively(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.deleteIfExists(f))
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
