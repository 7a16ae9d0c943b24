package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

import graft.streaming.BatchLayout

/** Generation-versioned index store — the on-disk lifecycle for the
  * persisted retrieval indexes (the IVF inverted lists, the text
  * posting lists): a BASE table in `gen-<n>` directories behind an
  * atomic `_CURRENT` commit pointer, plus the streaming ingest twins'
  * `batch_id=<id>` fragment directories and a tombstone key table.
  * This is the Lucene segment-lifecycle shape re-expressed as a parquet
  * layout: ingest appends small fragments, COMPACTION merges
  * (base ∪ fragments − tombstones) into the next generation, and
  * serving reads always resolve one complete committed snapshot.
  *
  * Commit protocol: `_CURRENT` holds `<gen> <fragWatermark>` — the
  * committed generation and the HIGHEST fragment batch_id absorbed
  * into it. A serving read is `gen-<g>` ∪ fragments with
  * `batch_id > watermark`, minus live tombstones. Compaction writes
  * `gen-<g+1>` completely, then swaps the pointer with an atomic
  * rename; consumed fragments and the stale generation are deleted
  * only AFTER the swap. Every crash window is therefore safe:
  *   - crash mid-write of `gen-<g+1>`: the pointer still names
  *     `gen-<g>`; readers see the old snapshot; the partial directory
  *     is overwritten by the next compaction (same target, Overwrite);
  *   - crash after the swap, before fragment GC: readers already use
  *     `gen-<g+1>` and the watermark EXCLUDES the absorbed-but-not-yet-
  *     deleted fragments — no double counting; the next compaction (or
  *     [[gc]]) removes them.
  * Readers never see a mix of generations, and a fragment is counted
  * exactly once at every point in time.
  *
  * Tombstones are a KEY TABLE (`tombstones/batch_id=<id>` parquet — the
  * GDPR/erasure shape: arbitrary ids, batch- or stream-delivered), not
  * a predicate: serving reads anti-join the live tombstone set, and
  * compaction applies them PHYSICALLY — the new generation contains no
  * tombstoned row. Tombstone rows stay after compaction (a later
  * fragment could re-deliver an erased key; the anti-join must keep
  * winning) — they are retired explicitly via [[purgeTombstones]] once
  * the owner knows ingest can no longer resurrect those keys.
  *
  * At 100 TB: fragments are micro-batch-sized, tombstones are key
  * lists (both broadcastable); compaction is one shuffle-free
  * partitionBy rewrite of the base per generation — and with
  * `partitionCols` (the IVF lists' `cent_id`) the new generation keeps
  * the hive layout, so dynamic partition pruning serves probes from
  * the compacted base exactly as before (plan-audited in
  * PlanAuditSpec). Writer contract: single compactor at a time (run it
  * from the ingest owner, between micro-batches); readers need no
  * coordination.
  */
object IndexStore {

  /** The committed snapshot: generation + highest absorbed fragment. */
  final case class Commit(gen: Long, fragWatermark: Long)

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def genPath(root: String, g: Long) = s"$root/gen-$g"
  private def commitPath(root: String, g: Long) = s"$root/_commit-$g"
  def fragmentsDir(root: String): String = s"$root/fragments"
  def tombstonesDir(root: String): String = s"$root/tombstones"

  private def readCommitFile(spark: SparkSession, p: Path): Option[Commit] = {
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      // exists→open is itself racy against the writer's delete→rename:
      // a vanished file reads as None (and commitOf's retry re-probes)
      val in = try f.open(p)
        catch { case _: java.io.FileNotFoundException => return None }
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      val parts = txt.split("\\s+")
      Some(Commit(parts(0).toLong, parts(1).toLong))
    }
  }

  private def writeCommitFile(spark: SparkSession, root: String, path: Path,
      c: Commit): Unit = {
    val f = fs(spark, path)
    f.mkdirs(new Path(root))
    val tmp = new Path(root, s"${path.getName}.tmp-${System.nanoTime()}")
    val out = f.create(tmp, true)
    try out.write(s"${c.gen} ${c.fragWatermark}".getBytes("UTF-8")) finally out.close()
    if (f.exists(path)) f.delete(path, false)
    if (!f.rename(tmp, path))
      throw new java.io.IOException(s"failed to commit $c at $path")
  }

  /** Parse `_CURRENT` (None before [[writeBase]]). Rename onto an
    * existing file is not atomic-replace on every FS, so
    * [[swapCurrent]] deletes then renames — a sub-millisecond
    * missing-pointer window for a reader racing the single writer's
    * swap. Closed HERE with a bounded retry: a missing pointer is
    * re-checked [[CommitRetries]] times before it is believed. The
    * only cost lands on the legitimately-uncommitted store (a few ms
    * before `None`), never on the committed hot path (first probe
    * hits).
    */
  def commitOf(spark: SparkSession, root: String): Option[Commit] = {
    val p = new Path(root, "_CURRENT")
    var attempt = 0
    while (true) {
      readCommitFile(spark, p) match {
        case some @ Some(_) => return some
        case None if attempt < CommitRetries =>
          attempt += 1
          Thread.sleep(CommitRetrySleepMs)
        case None => return None
      }
    }
    None // unreachable
  }

  /** Missing-`_CURRENT` re-checks before a reader believes the store is
    * uncommitted — sized to dwarf the writer's delete→rename gap
    * (sub-ms on a local FS, single-digit ms on an object store's
    * metadata path) while keeping the genuine-None path under ~50 ms.
    */
  private val CommitRetries = 5
  private val CommitRetrySleepMs = 10L

  // The per-generation `_commit-<g>` sidecar (same format) is what lets
  // [[readAt]] resolve a RETAINED generation's watermark after the
  // pointer has moved on.
  private def swapCurrent(spark: SparkSession, root: String, c: Commit): Unit = {
    writeCommitFile(spark, root, new Path(commitPath(root, c.gen)), c)
    writeCommitFile(spark, root, new Path(root, "_CURRENT"), c)
  }

  /** Publish `df` as generation 0 (no fragments absorbed yet). */
  def writeBase(df: DataFrame, root: String, partitionCols: Seq[String] = Nil): Commit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(genPath(root, 0L))
    val c = Commit(0L, -1L)
    swapCurrent(df.sparkSession, root, c)
    c
  }

  /** REBASE: replace the store's content wholesale with `df` as the
    * next generation — the rebuild-from-survivors lifecycle op for
    * SET-KEYED families (the gram store), where per-row tombstones
    * cannot express erasure because keys are not row-owned (a gram is
    * shared by every document containing it): erasing documents from
    * the protected corpus means re-deriving the key set from the
    * survivors and swapping it in. Same atomic-pointer discipline as
    * [[compact]] — readers see the old or the new generation, never a
    * mix — and the fragment watermark advances past every current
    * fragment (their content is superseded by the rebuilt frame, which
    * the caller derives from the full surviving corpus). GC retires
    * the gen−2 snapshot exactly as after a compaction.
    */
  def rebase(df: DataFrame, root: String,
      partitionCols: Seq[String] = Nil): Commit = {
    val spark = df.sparkSession
    val c = commitOf(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed generation under $root"))
    val fragIds = BatchLayout.batchDirs(spark, fragmentsDir(root))
      .map(_.split("batch_id=").last.toLong)
    val newWatermark = if (fragIds.isEmpty) c.fragWatermark
      else math.max(c.fragWatermark, fragIds.max)
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(genPath(root, c.gen + 1))
    val next = Commit(c.gen + 1, newWatermark)
    swapCurrent(spark, root, next)
    gc(spark, root, next, retiredWatermark = c.fragWatermark)
    next
  }

  /** Append one fragment (the batch twin of the streaming ingest
    * sinks' `batch_id=<id>` write — idempotent per id).
    */
  def addFragment(df: DataFrame, root: String, batchId: Long): Unit =
    df.write.mode(SaveMode.Overwrite)
      .parquet(s"${fragmentsDir(root)}/batch_id=$batchId")

  /** Append tombstone KEYS (any schema whose columns are the anti-join
    * keys of the stored rows — typically one id column).
    */
  def addTombstones(df: DataFrame, root: String, batchId: Long): Unit =
    df.write.mode(SaveMode.Overwrite)
      .parquet(s"${tombstonesDir(root)}/batch_id=$batchId")

  /** Every live tombstone key (empty typed frame when none). */
  def tombstones(spark: SparkSession, root: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    BatchLayout.readFragments(spark, tombstonesDir(root), schema)

  /** The SERVING read: committed generation ∪ unabsorbed fragments,
    * minus live tombstones (broadcast anti-join on the tombstone
    * frame's columns). `schema` types the fragment/tombstone reads so
    * the store serves correctly even before any fragment exists.
    */
  def read(spark: SparkSession, root: String,
      schema: org.apache.spark.sql.types.StructType,
      tombstoneKeys: Seq[String] = Nil,
      maxFragmentId: Long = Long.MaxValue): DataFrame = {
    val c = commitOf(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed generation under $root"))
    readSnapshot(spark, root, schema, c, tombstoneKeys, maxFragmentId)
  }

  /** TIME TRAVEL: the serving read as of generation `gen` — possible
    * for the current generation and (thanks to the one-generation
    * retention lag of [[gc]]) the previous one, whose directory,
    * absorbed fragments, and `_commit-<g>` watermark survive until the
    * NEXT compaction retires them. A reader pinned to the old snapshot
    * therefore keeps a complete, consistent view through a concurrent
    * compaction — the snapshot-isolation contract.
    *
    * `maxFragmentId` pins the FRAGMENT side of the snapshot too: a
    * generation alone is a lower bound (later-arriving fragments are
    * part of every generation's serving view), so "the store exactly
    * as of commit (g, w)" is `readAt(gen = g, maxFragmentId = w)` —
    * the full-snapshot pin the stored-query lifecycle queries use to
    * reread a superseded query-table version after updates landed.
    */
  def readAt(spark: SparkSession, root: String, gen: Long,
      schema: org.apache.spark.sql.types.StructType,
      tombstoneKeys: Seq[String] = Nil,
      maxFragmentId: Long = Long.MaxValue): DataFrame = {
    val c = readCommitFile(spark, new Path(commitPath(root, gen))).getOrElse(
      throw new IllegalStateException(
        s"generation $gen of $root is unknown or retired"))
    readSnapshot(spark, root, schema, c, tombstoneKeys, maxFragmentId)
  }

  private def readSnapshot(spark: SparkSession, root: String,
      schema: org.apache.spark.sql.types.StructType, c: Commit,
      tombstoneKeys: Seq[String],
      maxFragmentId: Long = Long.MaxValue): DataFrame = {
    // hive partition columns read back as the INFERRED type (cent_id
    // comes back INT whatever was written) — cast every column to the
    // declared schema so base and fragments union cleanly
    val base = spark.read.parquet(genPath(root, c.gen))
      .select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
    val frags = unabsorbedFragments(spark, root, c, schema, maxFragmentId)
    val all = base.unionByName(frags)
    if (tombstoneKeys.isEmpty) all
    else {
      val ts = tombstones(spark, root, org.apache.spark.sql.types.StructType(
        tombstoneKeys.map(k => schema(k))))
      // broadcast is the right plan under the documented purge
      // discipline (tombstones stay a small key list) — but a
      // purge-deferred store must degrade to a shuffle anti-join, not
      // OOM the driver. The gauge is the tombstone dirs' on-disk byte
      // size (pure FS metadata, no job): parquet keys expand ~4-8× in
      // memory, so 16 MB on disk keeps the broadcast comfortably under
      // typical driver/executor headroom.
      val hinted =
        if (tombstoneBytes(spark, root) <= TombstoneBroadcastMaxBytes) broadcast(ts)
        else ts
      all.join(hinted, tombstoneKeys, "left_anti")
    }
  }

  /** On-disk byte size of the live tombstone key table (0 when none) —
    * the broadcast-vs-shuffle gauge for the serving anti-join.
    */
  private[graft] def tombstoneBytes(spark: SparkSession, root: String): Long = {
    val p = new Path(tombstonesDir(root))
    val f = fs(spark, p)
    if (!f.exists(p)) 0L
    else {
      val it = f.listFiles(p, true)
      var bytes = 0L
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        if (st.isFile && !name.startsWith(".") && !name.startsWith("_")) bytes += st.getLen
      }
      bytes
    }
  }

  /** Disk-size threshold above which the serving read's tombstone
    * anti-join abandons the broadcast hint for a shuffle anti-join.
    * Overridable per-JVM for tests (and for clusters with bigger
    * driver headroom) via -Dgraft.tombstone.broadcast.max.bytes.
    */
  private[graft] def TombstoneBroadcastMaxBytes: Long =
    sys.props.get("graft.tombstone.broadcast.max.bytes").map(_.toLong)
      .getOrElse(16L * 1024 * 1024)

  /** Fragments NOT yet absorbed into the committed generation:
    * `batch_id > watermark`. Partition-directory listing + the pushed
    * batch_id predicate — absorbed fragments are never scanned.
    */
  private def unabsorbedFragments(spark: SparkSession, root: String, c: Commit,
      schema: org.apache.spark.sql.types.StructType,
      maxFragmentId: Long = Long.MaxValue): DataFrame = {
    // maxFragmentId bounds the view from above — a replayed consumer
    // reads the store AS OF BEFORE its own (possibly half-written)
    // fragment and later arrivals (the StreamGramSet idempotence
    // contract)
    val dirs = BatchLayout.batchDirs(spark, fragmentsDir(root))
      .filter { d =>
        val id = d.split("batch_id=").last.toLong
        id > c.fragWatermark && id <= maxFragmentId
      }
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.parquet(dirs: _*)
      .select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
  }

  /** COMPACTION: merge (committed generation ∪ fragments up to the
    * snapshot watermark − live tombstones) into generation g+1 and
    * swap the pointer. Preserves `partitionCols` hive layout, so
    * partition-pruned serving plans are unchanged post-compaction.
    * Returns the new commit. Crash-safe per the object contract;
    * consumed fragments and the stale generation are GC'd after the
    * swap (a crash between swap and GC only delays the GC).
    */
  def compact(spark: SparkSession, root: String,
      schema: org.apache.spark.sql.types.StructType,
      partitionCols: Seq[String] = Nil,
      tombstoneKeys: Seq[String] = Nil,
      targetRowsPerFile: Long = 4L * 1024 * 1024): Commit = {
    val c = commitOf(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed generation under $root"))
    // snapshot the fragment set FIRST: fragments arriving mid-compaction
    // stay above the new watermark and keep serving from the fragment path
    val fragIds = BatchLayout.batchDirs(spark, fragmentsDir(root))
      .map(_.split("batch_id=").last.toLong).filter(_ > c.fragWatermark)
    val newWatermark = if (fragIds.isEmpty) c.fragWatermark else fragIds.max
    val snapshot = read(spark, root, schema, tombstoneKeys)
    // compaction REPAIRS file counts, it doesn't just merge logically:
    // partitioned stores repartition on the partition key, so every
    // hive dir is written by exactly ONE task → one file per dir (the
    // q264 DPP read then opens one file per probed centroid); flat
    // stores size to ceil(rows/targetRowsPerFile) (the extra count is
    // a compaction-time cost, not a serving cost)
    val shaped =
      if (partitionCols.nonEmpty) snapshot.repartition(partitionCols.map(col): _*)
      else {
        val n = snapshot.count()
        snapshot.repartition(
          math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt)
      }
    val target = genPath(root, c.gen + 1)
    val w = shaped.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(target)
    val next = Commit(c.gen + 1, newWatermark)
    swapCurrent(spark, root, next)
    gc(spark, root, next, retiredWatermark = c.fragWatermark)
    next
  }

  /** GC with a ONE-GENERATION RETENTION LAG: the generation just
    * replaced (gen−1) survives — its directory, `_commit` sidecar, and
    * the fragments it still needs (batch_id > its own watermark) — so
    * a reader that pinned the previous `_CURRENT` (or calls [[readAt]])
    * keeps a complete snapshot through this compaction. What retires
    * here is the generation BEFORE that (gen−2) and every fragment at
    * or below the retained generation's watermark — absorbed by both
    * surviving snapshots, needed by neither.
    */
  private def gc(spark: SparkSession, root: String, c: Commit,
      retiredWatermark: Long): Unit = {
    val rootPath = new Path(root)
    val f = fs(spark, rootPath)
    val retired = c.gen - 2
    if (retired >= 0) {
      val stale = new Path(genPath(root, retired))
      if (f.exists(stale)) f.delete(stale, true)
      val meta = new Path(commitPath(root, retired))
      if (f.exists(meta)) f.delete(meta, false)
    }
    BatchLayout.batchDirs(spark, fragmentsDir(root))
      .filter(_.split("batch_id=").last.toLong <= retiredWatermark)
      .foreach { dir =>
        val p = new Path(dir)
        if (f.exists(p)) f.delete(p, true)
      }
  }

  /** Retire ALL tombstones — call only once the owner knows ingest can
    * no longer deliver the erased keys (e.g. after the source stream's
    * retention has passed). Until then tombstones survive compaction so
    * a re-delivered key stays erased.
    */
  def purgeTombstones(spark: SparkSession, root: String): Unit = {
    val p = new Path(tombstonesDir(root))
    val f = fs(spark, p)
    if (f.exists(p)) f.delete(p, true)
  }

  /** Parquet data-file count under the committed generation plus live
    * fragments — the small-file pressure gauge a compaction scheduler
    * reads (and the number IndexStoreSpec asserts drops).
    */
  def dataFileCount(spark: SparkSession, root: String): Long = {
    val c = commitOf(spark, root).getOrElse(return 0L)
    def count(dir: String): Long = {
      val p = new Path(dir)
      val f = fs(spark, p)
      if (!f.exists(p)) 0L
      else {
        val it = f.listFiles(p, true)
        var n = 0L
        while (it.hasNext) {
          val st = it.next()
          val name = st.getPath.getName
          if (st.isFile && !name.startsWith(".") && !name.startsWith("_")) n += 1
        }
        n
      }
    }
    count(genPath(root, c.gen)) +
      BatchLayout.batchDirs(spark, fragmentsDir(root))
        .filter(_.split("batch_id=").last.toLong > c.fragWatermark)
        .map(count).sum
  }

  /** Compaction SCHEDULING POLICY — the call a production ingest owner
    * makes between micro-batches: compact only when small-file pressure
    * ([[dataFileCount]]) exceeds `maxDataFiles`, otherwise leave the
    * committed generation alone. Returns the new commit when a
    * compaction ran, None when the store was already within budget.
    *
    * Threshold choice (ARCHITECTURE.md §index-lifecycle): each serving
    * read opens every live data file once, so the gauge IS the serving
    * read's open() count; compaction costs one full rewrite of the
    * base, so the policy amortizes that rewrite over
    * `maxDataFiles − (post-compaction file count)` micro-batches. For
    * the hive-partitioned stores (one file per cent_id dir after
    * compaction) a budget of ~4× the partition count keeps reads
    * pruned-scan-shaped while compacting only every few dozen batches.
    */
  def compactIfNeeded(spark: SparkSession, root: String,
      schema: org.apache.spark.sql.types.StructType,
      maxDataFiles: Long,
      partitionCols: Seq[String] = Nil,
      tombstoneKeys: Seq[String] = Nil): Option[Commit] =
    if (dataFileCount(spark, root) > maxDataFiles)
      Some(compact(spark, root, schema, partitionCols, tombstoneKeys))
    else None
}
