package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped registry of materialized CORPUS-SNAPSHOT ARTIFACTS —
  * the deterministic derived frames several queries share: the near-dup
  * cluster map (one connected-components solve feeds the q52 cluster
  * list, the q105 decision list, the q133 funnel, the q146 decision
  * table, and the q191 deletion audit), the trained coarse quantizers
  * and PQ codebooks (one Lloyd trajectory feeds every IVF/PQ consumer),
  * and the ANN audit rankings (one exact scan and one IVF search feed
  * the recall/MRR/nDCG/RBO/hubness audits).
  *
  * This is the materialized-view pattern a production deployment runs
  * explicitly: the cluster map and the index artifacts are WRITTEN once
  * per corpus snapshot (they are exactly what an ANN index stores) and
  * every downstream job reads the stored table instead of re-deriving
  * it. Within one analytics session the persisted frame is the same
  * thing without the filesystem round-trip. Because every builder here
  * is deterministic (hash seeding, decimal-exact folds), a consumer
  * reading the artifact is bit-identical to one re-deriving it — the
  * oracle hashes cannot tell the difference, only the job count can.
  *
  * Bounded by construction: each artifact is either constant-size
  * (centroids: nlist rows; codebooks: M·K rows), a narrow per-doc map
  * (cluster labels: 4 small columns), or a top-k table over the hash-
  * sampled audit query set — all safely persistable at any corpus
  * scale (MEMORY_AND_DISK spills rather than evicting correctness).
  * Keyed by (session, data dir, artifact name) so concurrent sessions
  * and different corpora never share state; entries live for the
  * session, like any cached table.
  */
object Materialized {

  /** One artifact slot. The build runs at most once (synchronized on
    * the cell, not the registry — concurrent first callers of the SAME
    * key share one build without serializing unrelated builds), and
    * eviction can see whether a frame was ever materialized without
    * triggering the build.
    */
  private final class Cell(build: () => DataFrame) {
    @volatile private var built: Option[DataFrame] = None
    def frame: DataFrame = built.getOrElse(synchronized {
      built.getOrElse {
        // eager localCheckpoint: materializes the solved frame (the
        // production "write") AND truncates lineage — consumers see a
        // flat scan of stored blocks, not the build plan. The lineage
        // cut matters beyond cleanliness: chained artifacts (the q263
        // deflation levels, each consuming the previous) would
        // otherwise nest every ancestor's plan as InMemoryRelation
        // innerChildren, and plan PRINTING re-renders each occurrence —
        // exponential in chain depth (round-12: treeString OOMed the
        // test JVM before any query ran). Blocks spill to disk like
        // the previous MEMORY_AND_DISK persist.
        //
        // Durability caveat: localCheckpoint TRUNCATES lineage, so an
        // executor loss permanently loses the blocks (nothing left to
        // recompute from) — fine in this repo's single-JVM local-mode
        // harness; a multi-executor deployment should route artifacts
        // that must survive executor loss through [[Materialized.onDisk]]
        // (the parquet path) instead of this in-session registry.
        val f = build().localCheckpoint(true)
        built = Some(f)
        f
      }
    })
    def builtFrame: Option[DataFrame] = built
    /** The RDD actually holding the checkpointed blocks. Dataset
      * .unpersist only clears CacheManager entries, and a local
      * checkpoint's blocks live OUTSIDE the CacheManager — eviction
      * must unpersist the LogicalRDD's rdd or the blocks linger until
      * GC + ContextCleaner get around to them.
      */
    def checkpointedRdd: Option[org.apache.spark.rdd.RDD[_]] =
      built.flatMap(_.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      })
  }

  private val reg =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), Cell]
  // Sessions whose SparkContext already carries our end-of-application
  // eviction listener (entries would otherwise pin persisted frames —
  // and their sessions — for the life of the JVM).
  private val hooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  private def hookEviction(s: SparkSession): Unit =
    if (hooked.add(s)) {
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          evict(s)
          hooked.remove(s) // context gone ⇒ drop the session reference too
        }
      })
    }

  /** Drops every artifact keyed to `s`, unpersisting best-effort (the
    * blocks are already gone once the context stopped; the point is
    * releasing the strong references).
    */
  def evict(s: SparkSession): Unit =
    // deliberately does NOT remove `s` from `hooked`: listener
    // registration and artifact lifetime are independent — evicting
    // between benchmark passes must not make the next Materialized.of
    // stack a fresh application-end listener per pass on the bus
    reg.keysIterator.filter(_._1 eq s).toList.foreach(dropCell)

  /** Drops ONE artifact — for tests that must force a rebuild of their
    * own key without wiping every cached artifact a later suite in the
    * same JVM would otherwise silently rebuild.
    */
  def evict(s: SparkSession, dir: String, key: String): Unit =
    dropCell((s, dir, key))

  private def dropCell(k: (SparkSession, String, String)): Unit =
    reg.remove(k).foreach { cell =>
      // unpersist the CHECKPOINTED RDD, not the Dataset: localCheckpoint
      // blocks live outside the CacheManager, so Dataset.unpersist would
      // free nothing and per-run eviction (StressBench's cold-cold
      // contract) would leak every prior run's blocks until GC
      cell.checkpointedRdd
        .foreach(r => try r.unpersist(blocking = false) catch { case _: Throwable => () })
    }

  /** The artifact for `key` over the corpus at `dir`, building and
    * persisting it on first use. The eager count() plays the role of
    * the production write: consumers read a SOLVED artifact, never a
    * lazy plan that would re-derive it per action. putIfAbsent + the
    * per-cell lock make the build once-only even under concurrent
    * first access; the application-end listener evicts the session's
    * entries so a long-lived multi-session process cannot leak them.
    */
  def of(s: SparkSession, dir: String, key: String)(build: => DataFrame): DataFrame = {
    hookEviction(s)
    val k = (s, dir, key)
    val cell = reg.get(k).getOrElse {
      val c = new Cell(() => build)
      reg.putIfAbsent(k, c).getOrElse(c)
    }
    cell.frame
  }

  // JVM-lifetime root for DISK artifacts: fresh per process, so an
  // artifact is reused across queries and bench passes within a run but
  // can never go stale against a newer builder in a later run.
  private lazy val diskRoot: java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft-artifacts-")

  /** The artifact persisted THROUGH THE FILESYSTEM — the production
    * index-maintenance "reuse" branch, actually exercised: built and
    * parquet-written once per (corpus, key) in this process, then every
    * consumer — later queries, later bench passes — READS the stored
    * table (a real parquet scan, not a cached plan). Builders are
    * deterministic, so the disk reader is bit-identical to a
    * re-deriver: MaterializedDiskSpec asserts it directly, and the
    * consumer query's DuckDB oracle re-derives from scratch, so the
    * round-trip sits under the hash gate every round.
    *
    * The write is atomic: build into a tmp directory, rename into
    * place. The rebuild check keys on the TARGET DIRECTORY existing —
    * the rename only ever publishes a complete table, so presence is
    * completeness (and the check survives sessions that disable
    * _SUCCESS markers). A concurrent loser's rename fails on the
    * existing target with FileAlreadyExistsException; it deletes its
    * tmp copy (no orphan growth in a long-lived process) and reads the
    * winner's table. Any OTHER filesystem failure — permissions, disk
    * full — propagates instead of resurfacing later as a confusing
    * missing-path read error.
    */
  /** `partitionCols`: hive-style partition the stored table — the
    * inverted-index file layout (e.g. the IVF lists by cent_id), so a
    * reader with a partition-key predicate scans only its partitions'
    * files. Readers see the partition column appended (inferred type);
    * callers normalize its type if the build column was wider.
    */
  def onDisk(s: SparkSession, dir: String, key: String,
      partitionCols: Seq[String] = Nil)(build: => DataFrame): DataFrame = {
    import java.nio.file.{Files, FileAlreadyExistsException}
    val corpus = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val path = diskRoot.resolve(s"$corpus-$key")
    if (!Files.exists(path)) synchronized {
      if (!Files.exists(path)) {
        val tmp = diskRoot.resolve(s"$corpus-$key.tmp-${System.nanoTime()}")
        val w = build.write.mode("overwrite")
        (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
          .parquet(tmp.toString)
        try Files.move(tmp, path)
        catch {
          case _: FileAlreadyExistsException => // lost the race; winner is complete
            org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
        }
      }
    }
    s.read.parquet(path.toString)
  }
}
