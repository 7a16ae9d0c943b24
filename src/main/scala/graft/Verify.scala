package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.{ConcurrentLinkedQueue, Executors, FutureTask, TimeUnit, TimeoutException}

import org.apache.spark.sql.SparkSession

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * LOSS-PROOF DESIGN (round-14 lesson: `CORRECTNESS_r14.json` was `{}`
  * because oracle_sql.json was written as the very LAST step — a
  * driver-side kill of a load-slowed run before that final write zeroed
  * the whole round even though all per-query dumps were on disk):
  *
  *   1. oracle_sql.json is written FIRST — the full map, atomically
  *      (tmp + rename), before any query runs. A kill at ANY later
  *      point leaves the compare runnable: completed dumps PASS,
  *      missing ones show as honest "no output dir" rows.
  *   2. After EVERY completed dump the file is atomically rewritten
  *      restricted to the completed set, so a kill mid-board yields a
  *      clean all-PASS partial record with zero truncation noise.
  *   3. Queries run in NUMERIC order (q01..q35 = the SURVEY §2
  *      contract, then the extension board ascending) so any truncated
  *      run certifies §2 first.
  *   4. A global wall-clock budget (Bench discipline) stops cleanly
  *      before any external ceiling: remaining queries are recorded in
  *      verify_meta.json as "skipped", never as failures.
  *   5. Bounded concurrency (default 3 in flight) takes the idle wall
  *      from ~8 min toward ~3 min — the same headroom a 2× ambient
  *      load would otherwise consume. Dumps are independent; FAIR
  *      scheduling keeps one long query from starving the others.
  *
  * Robust to a single bad query: failures are logged and skipped, and a
  * watchdog cancels any query that hangs (a planning explosion must
  * cost one query, not the whole gate).
  */
object Verify {
  private val PerQueryTimeoutSec = sys.env.getOrElse("SPARK_GRAFT_Q_TIMEOUT", "300").toInt
  private val GlobalBudgetSec = sys.env.getOrElse("SPARK_GRAFT_VERIFY_BUDGET", "1500").toInt
  private val Concurrency = sys.env.getOrElse("SPARK_GRAFT_VERIFY_CONC", "3").toInt
  // Diagnostic bisection knobs (default = production behavior): the
  // round-15 empty-dump race was isolated by toggling these on the full
  // board. Kept so a future flake can be bisected the same way.
  private val ClearCacheBetween = sys.env.getOrElse("SPARK_GRAFT_VERIFY_CLEARCACHE", "1") == "1"
  private val FairScheduling = sys.env.getOrElse("SPARK_GRAFT_VERIFY_FAIR", "1") == "1"
  // How many completed dumps between cache clears. Clearing after EVERY
  // dump (the round-14 spelling) raced the other in-flight dumps:
  // spark.catalog.clearCache() concurrently with a query READING one of
  // those InMemoryRelations silently emptied the scan (3/3 full boards
  // each corrupted one query to a 0-row dump, job SUCCESS — q282, q105;
  // 2/2 boards clean with clearCache off). Eviction is supposed to be
  // recompute-safe, but uncache-then-recache churn across 3 threads is
  // not: so clears now happen only at EXCLUSIVE safe points (all dumps
  // drained), every N completions — same bounded memory, zero races.
  private val ClearEvery = sys.env.getOrElse("SPARK_GRAFT_VERIFY_CLEAR_EVERY", "24").toInt

  // Dev-loop subset: SPARK_GRAFT_ONLY=q65_ann_ivf,q67_embed_centroids
  // restricts the dump (and oracle json) to the named queries.
  private val Only: Option[Set[String]] =
    sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
  private def selected[V](m: Map[String, V]): Map[String, V] =
    Only.map(s => m.view.filterKeys(s).toMap).getOrElse(m)

  /** qNN_name → NN; queries sort numerically so §2 (q01-q35) dumps first. */
  private[graft] def queryNumber(name: String): Int =
    name.drop(1).takeWhile(_.isDigit) match {
      case "" => Int.MaxValue
      case d  => d.toInt
    }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** tmp-file + atomic rename: the compare must never observe a
    * half-written oracle_sql.json, no matter when the JVM dies.
    */
  private def writeJsonAtomic(path: String, entries: Iterable[(String, String)]): Unit = {
    val json = entries.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    val tmp = Paths.get(path + ".tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, Paths.get(path),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // concurrent dumps share the cores fairly instead of FIFO
      // head-of-line blocking behind one heavy plan
      .config("spark.scheduler.mode", if (FairScheduling) "FAIR" else "FIFO")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.GraftSession.tune(spark)
    new java.io.File(outDir).mkdirs()

    val oracle = selected(SparkEntry.oracleSql)
    val names = selected(SparkEntry.queries).keys.toSeq
      .sortBy(n => (queryNumber(n), n))
    // (1) full map FIRST: pure metadata, available before any query runs
    writeJsonAtomic(s"$outDir/oracle_sql.json", names.flatMap(n => oracle.get(n).map(n -> _)))

    val completed = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val failed = new ConcurrentLinkedQueue[String]()
    val rewriteLock = new Object
    // (2) restrict the map to attempted queries (completed + failed): a
    // later kill leaves a record where every completed dump PASSes and
    // every REAL failure still surfaces as a FAIL row ("no output dir")
    // — only not-yet-attempted queries drop out, so truncation noise is
    // zero but an engine bug can never vanish from the official record.
    def rewriteAttempted(): Unit = rewriteLock.synchronized {
      val attempted = completed.toArray(Array.empty[String]).toSet ++
        failed.toArray(Array.empty[String]).toSet
      writeJsonAtomic(s"$outDir/oracle_sql.json",
        names.filter(attempted).flatMap(n => oracle.get(n).map(n -> _)))
    }

    val t0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - t0) / 1e9

    // A driver-side SIGTERM interrupts the in-flight dumps, which then
    // throw; recording those as "failed" would leave FAIL rows in the
    // official record for queries the PROCESS interrupted (the Bench
    // in-flight lesson). Once shutdown begins, exceptions from dumps
    // are kill-noise: the query stays un-attempted and drops out of
    // the restricted oracle map instead.
    @volatile var shuttingDown = false
    Runtime.getRuntime.addShutdownHook(new Thread(() => { shuttingDown = true }))

    val queue = new ConcurrentLinkedQueue[String]()
    names.foreach(queue.add)
    val skipped = new ConcurrentLinkedQueue[String]()
    val taskPool = Executors.newCachedThreadPool()

    // Dumps hold the READ side; cache clears hold the WRITE side, so a
    // clear only ever runs with ZERO dumps in flight (fair = a pending
    // writer blocks new readers instead of starving). See ClearEvery.
    val cacheGate = new java.util.concurrent.locks.ReentrantReadWriteLock(true)
    val sinceClear = new java.util.concurrent.atomic.AtomicInteger(0)

    def dumpOnce(name: String): Unit = {
      val task = new FutureTask[Unit](() => {
        spark.sparkContext.setJobGroup(s"verify-$name", name, interruptOnCancel = true)
        SparkEntry.queries(name)(spark, sfDir)
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      })
      taskPool.execute(task)
      try task.get(PerQueryTimeoutSec, TimeUnit.SECONDS)
      catch {
        case e: TimeoutException =>
          System.err.println(s"[verify] $name TIMED OUT after ${PerQueryTimeoutSec}s; cancelling")
          spark.sparkContext.cancelJobGroup(s"verify-$name")
          task.cancel(true)
          throw e
      }
    }

    // Parquet footer row count of a completed dump — metadata-only, no
    // data scan (the tripwire must stay cheap at any SF).
    def dumpRows(name: String): Long = {
      val dir = new java.io.File(s"$outDir/$name")
      val files = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.endsWith(".parquet"))
      files.map { f =>
        val in = org.apache.hadoop.fs.Path.getPathWithoutSchemeAndAuthority(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath))
        val conf = spark.sparkContext.hadoopConfiguration
        val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
          conf, in, org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
        footer.getBlocks.toArray.map(_.asInstanceOf[org.apache.parquet.hadoop.metadata.BlockMetaData].getRowCount).sum
      }.sum
    }

    def runOne(name: String): Unit = {
      val r = cacheGate.readLock()
      r.lock()
      val ok = try { dumpOnce(name); true }
        catch {
          case e: Throwable =>
            if (e.getMessage != null && !e.isInstanceOf[TimeoutException])
              System.err.println(s"[verify] $name failed: ${e.getMessage}")
            if (!shuttingDown) failed.add(name)
            false
        } finally r.unlock()
      if (ok) {
        // Zero-row tripwire: every board query legitimately returns rows,
        // so a 0-row dump with a SUCCEEDED job is the cache-churn race
        // signature. Retry once at an exclusive safe point (no concurrent
        // dumps, cache cleared) and keep whatever the clean re-run says —
        // a genuinely-empty result would simply dump empty again.
        var good = true
        if (dumpRows(name) == 0L && !shuttingDown) {
          System.err.println(s"[verify] $name dumped 0 rows; exclusive retry")
          val w = cacheGate.writeLock()
          w.lock()
          try {
            spark.catalog.clearCache()
            sinceClear.set(0)
            dumpOnce(name)
          } catch {
            case _: Throwable => if (!shuttingDown) { failed.add(name); good = false }
          } finally w.unlock()
        }
        if (good) completed.add(name)
      }
      rewriteAttempted()
      // several operators cache shared subtrees (minhash signatures,
      // shingle sets, band tables) and leave lifecycle to the caller;
      // over a 330+-query run those pins would accumulate to real
      // executor memory. Clearing is NOT safe concurrently with other
      // in-flight dumps (the round-15 empty-dump race) — take the write
      // side so the clear runs alone, every ClearEvery completions.
      if (ClearCacheBetween && sinceClear.incrementAndGet() >= ClearEvery) {
        val w = cacheGate.writeLock()
        w.lock()
        try {
          if (sinceClear.get() >= ClearEvery) {
            spark.catalog.clearCache()
            sinceClear.set(0)
          }
        } finally w.unlock()
      }
    }

    val workers = (1 to math.max(1, Concurrency)).map { i =>
      new Thread(() => {
        var next = queue.poll()
        while (next != null) {
          if (elapsed < GlobalBudgetSec) runOne(next)
          else {
            skipped.add(next)
            System.err.println(s"[verify] budget exhausted (${GlobalBudgetSec}s); skipping $next")
          }
          next = queue.poll()
        }
      }, s"verify-worker-$i")
    }
    workers.foreach(_.start())
    workers.foreach(_.join())

    // (4) clean-exit record: attempted-only map (PASS for every dump,
    // FAIL row for every real failure) plus an explicit meta sidecar so
    // a budget truncation is visible, never silently absorbed.
    rewriteAttempted()
    val done = completed.toArray(Array.empty[String]).toSet
    val skippedArr = skipped.toArray(Array.empty[String]).sorted
    val failedArr = failed.toArray(Array.empty[String]).sorted
    def arr(xs: Seq[String]) = xs.map(q).mkString("[", ",", "]")
    Files.writeString(Paths.get(s"$outDir/verify_meta.json"),
      s"""{"completed":${done.size},"failed":${arr(failedArr.toSeq)},"skipped":${arr(skippedArr.toSeq)},""" +
      s""""elapsed_sec":${elapsed.toInt},"budget_sec":$GlobalBudgetSec,"concurrency":$Concurrency}""")
    System.err.println(
      s"[verify] done: ${done.size} completed, ${failedArr.length} failed, " +
      s"${skippedArr.length} budget-skipped in ${elapsed.toInt}s")

    taskPool.shutdownNow()
    // silence the app-end eviction WARN flood (the round-13 bench-tail
    // lesson) so any stdout the driver tails stays meaningful
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    // always rc 0: per-query verdicts belong to the DuckDB compare —
    // a nonzero exit here could make the driver discard a 99%-green
    // board over one flaky query
  }
}
