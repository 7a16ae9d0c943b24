package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.Comparator

import scala.jdk.CollectionConverters._

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
    * With `partitionCol` set (e.g. the window start), the store is
    * partition-scoped: a micro-batch rewrites only the partitions it
    * touches instead of the whole store.
    */
  def parquetUpsert(df: DataFrame, outDir: String, keyCols: Seq[String],
      checkpointDir: String, triggerInterval: String = "5 seconds",
      partitionCol: Option[String] = None): DataStreamWriter[Row] =
    df.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        partitionCol match {
          case Some(p) => upsertBatchPartitioned(batch, outDir, keyCols, p)
          case None => upsertBatch(batch, outDir, keyCols)
        }
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
    val fresh = batch.persist()
    try {
      if (!fresh.isEmpty) mergeDir(fresh, outDir, keyCols)
    } finally fresh.unpersist()
  }

  /** Partition-scoped upsert: rows route to a partition directory by
    * `partCol` (typically the aggregation window start) and a
    * micro-batch rewrites ONLY the partitions it touches — per-batch
    * cost is bounded by the batch's own window span, not the store's
    * accumulated size (a flat store rewrites everything every batch:
    * O(total²) over a day of 5 s triggers). Each partition keeps its own
    * gen-N/_CURRENT commit protocol, so atomicity is unchanged, now at
    * partition granularity; a crash mid-batch leaves every partition
    * readable and checkpoint replay re-merges idempotently.
    *
    * The driver-side loop over `collect()`ed partition values is
    * bounded by the number of distinct windows in ONE micro-batch (a
    * handful), never by store or corpus size.
    */
  def upsertBatchPartitioned(batch: DataFrame, outDir: String, keyCols: Seq[String],
      partCol: String): Unit = {
    // Each partition dedups only within itself; a key that could appear
    // under two partition values would silently duplicate in the store.
    require(keyCols.contains(partCol),
      s"partCol '$partCol' must be one of the merge keys $keyCols")
    val fresh = batch.persist()
    try {
      if (!fresh.isEmpty) {
        val parts = fresh.select(col(partCol)).distinct().collect().map(_.get(0))
        parts.foreach { pv =>
          val slice =
            if (pv == null) fresh.filter(col(partCol).isNull)
            else fresh.filter(col(partCol) === lit(pv))
          mergeDir(slice, partPath(outDir, pv), keyCols)
        }
      }
    } finally fresh.unpersist()
  }

  /** Merge `rows` into one generation-versioned directory (the commit
    * unit: a whole flat store, or a single partition of a partitioned
    * one).
    */
  private def mergeDir(rows: DataFrame, dir: String, keyCols: Seq[String]): Unit = {
    val spark = rows.sparkSession
    val cur = currentGen(dir)
    val merged = cur match {
      case Some(g) =>
        val existing = spark.read.parquet(genPath(dir, g))
        val newKeys = rows.select(keyCols.map(col): _*).distinct()
        existing.join(broadcast(newKeys), keyCols, "left_anti").unionByName(rows)
      case None => rows
    }
    val next = cur.map(_ + 1).getOrElse(0L)
    merged.write.mode(SaveMode.Overwrite).parquet(genPath(dir, next))
    val tmp = Paths.get(dir, "_CURRENT.tmp")
    Files.write(tmp, next.toString.getBytes(UTF_8))
    Files.move(tmp, Paths.get(dir, "_CURRENT"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    cur.filter(_ >= 1).foreach(g => deleteRecursively(genPath(dir, g - 1)))
  }

  /** Reader-safe small-file compaction for a gen-versioned store: each
    * (partition) directory's committed generation is rewritten as
    * ceil(rows/targetRowsPerFile) right-sized files in a NEW generation
    * and the `_CURRENT` pointer swapped atomically — concurrent readers
    * always resolve a complete generation, never a missing or half-
    * written path (unlike `FileLayout.compact`, whose in-place rename
    * swap requires quiesced readers).
    *
    * WRITER contract: reader-safe is NOT writer-safe. Like every
    * writer of this store format, compactStore derives the next
    * generation from `_CURRENT` — racing a concurrent `upsertBatch*`
    * both writers target the same `gen-(g+1)` and whichever swaps the
    * pointer last silently discards the other's rows. Run it from the
    * store's single writer, between micro-batches (foreachBatch
    * serializes per query, so calling it there is safe).
    */
  def compactStore(spark: SparkSession, outDir: String, targetRowsPerFile: Long): Unit = {
    val dirs = { val p = listPartDirs(outDir); if (p.nonEmpty) p else Seq(outDir) }
    dirs.foreach { dir =>
      currentGen(dir).foreach { g =>
        val cur = spark.read.parquet(genPath(dir, g))
        val rows = cur.count()
        val nFiles = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
        cur.repartition(nFiles).write.mode(SaveMode.Overwrite).parquet(genPath(dir, g + 1))
        val tmp = Paths.get(dir, "_CURRENT.tmp")
        Files.write(tmp, (g + 1).toString.getBytes(UTF_8))
        Files.move(tmp, Paths.get(dir, "_CURRENT"),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        if (g >= 1) deleteRecursively(genPath(dir, g - 1))
      }
    }
  }

  /** Read the committed state of an upsert store (resolves `_CURRENT`;
    * for a partitioned store, unions every partition's committed
    * generation).
    */
  def readStore(spark: SparkSession, outDir: String): DataFrame = {
    val partDirs = listPartDirs(outDir)
    if (partDirs.nonEmpty) {
      val frames = partDirs.flatMap(d =>
        currentGen(d).map(g => spark.read.parquet(genPath(d, g))))
      if (frames.isEmpty)
        throw new IllegalStateException(s"no committed generation under $outDir")
      frames.reduce(_.unionByName(_))
    } else currentGen(outDir) match {
      case Some(g) => spark.read.parquet(genPath(outDir, g))
      case None => throw new IllegalStateException(s"no committed generation under $outDir")
    }
  }

  /** Filesystem-safe partition directory. Temporal values encode as
    * epoch numbers — `Timestamp.toString` renders in the JVM's default
    * zone, which would map the SAME window to DIFFERENT directories
    * after a restart in another timezone. Nulls get a reserved token.
    * The encoding is part of the store's on-disk format: changing it
    * requires rewriting (or draining) existing stores, exactly like a
    * table-format version bump.
    */
  private def partPath(outDir: String, pv: Any): String = {
    val enc = pv match {
      case null => "__NULL__"
      case t: java.sql.Timestamp => s"ts-${t.getTime}"
      // Date.getTime is local-midnight millis (zone-dependent);
      // toLocalDate renders the stable calendar value
      case d: java.sql.Date => s"d-${d.toLocalDate}"
      case t: java.time.Instant => s"ts-${t.toEpochMilli}"
      case other => java.net.URLEncoder.encode(String.valueOf(other), UTF_8)
    }
    s"$outDir/p=$enc"
  }

  /** Generations currently on disk for an (unpartitioned) store dir,
    * ascending. Retention keeps the current and previous generation
    * (upsert/compact delete `gen-(g-1)` only after committing `g+1`),
    * so a reader can pin the prior snapshot while a writer advances.
    */
  def listGenerations(outDir: String): Seq[Long] = {
    val d = new java.io.File(outDir)
    Option(d.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
      .map(_.getName.stripPrefix("gen-").toLong)
      .sorted
  }

  /** Time-travel read: a SPECIFIC committed generation of an
    * unpartitioned store — the snapshot-isolation read (audits, diffing
    * a batch's effect, reproducing yesterday's training input) the
    * `_CURRENT`-resolving readStore cannot express. Throws if the
    * generation has been retired by retention.
    */
  def readStoreAt(spark: SparkSession, outDir: String, gen: Long): DataFrame = {
    if (!listGenerations(outDir).contains(gen))
      throw new IllegalArgumentException(
        s"generation $gen not on disk under $outDir (have ${listGenerations(outDir).mkString(",")})")
    spark.read.parquet(genPath(outDir, gen))
  }

  /** The committed generation number of an unpartitioned store. */
  def currentGeneration(outDir: String): Option[Long] = currentGen(outDir)

  private def listPartDirs(outDir: String): Seq[String] = {
    val root = Paths.get(outDir)
    if (!Files.isDirectory(root)) Seq.empty
    else {
      val s = Files.list(root)
      try s.iterator().asScala.toSeq
        .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("p="))
        .map(_.toString).sorted
      finally s.close()
    }
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

  /** foreachBatch keyed JDBC upsert — update-mode window re-emissions
    * MERGE into the PK'd aggregate table instead of violating its
    * primary key on replay (the reference's stream-agg table has
    * PRIMARY KEY (window_start, device_id, device_type)).
    */
  def jdbcUpsert(df: DataFrame, url: String, table: String, keyCols: Seq[String],
      user: String, password: String, checkpointDir: String,
      triggerInterval: String = "5 seconds",
      progressTable: Option[String] = None): DataStreamWriter[Row] =
    df.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val fresh = batch.persist()
        try {
          if (!fresh.isEmpty) progressTable match {
            case Some(pt) =>
              graft.sources.Connectors.upsertJdbcOnce(
                fresh, batchId, url, table, pt, keyCols, user, password): Unit
            case None =>
              graft.sources.Connectors.upsertJdbc(fresh, url, table, keyCols, user, password)
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
