package graft

import java.util.concurrent.{Executors, TimeUnit, TimeoutException, FutureTask}

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, printing one JSON line with per-query seconds.
  *
  * Queries are materialized through the noop sink (full execution
  * including final sort — count() would let the optimizer drop work).
  *
  * PASS DESIGN (round-14 lesson: a separate warmup pass over the full
  * board ate most of the 1500 s budget on a ~2×-loaded box, timed pass
  * 1 died a third of the way in, and 116 never-timed queries were
  * recorded as "failures" — the official record read as 116 broken
  * queries when the truth was 0):
  *
  *   - NO separate warmup: pass 1 is timed and scored. Passes 2+
  *     refine the MIN — JIT/codegen warm-up can only INFLATE pass 1,
  *     and a min is the statistic later passes can only improve, so
  *     folding warmup in costs accuracy only when the budget dies
  *     after one pass — exactly the case where a slightly-inflated
  *     timing beats no timing at all.
  *   - ADAPTIVE pass count: another full pass starts only if the
  *     remaining budget covers the measured cost of the previous pass
  *     with 30% headroom, up to [[TimedPasses]]. The board can grow
  *     without silently outgrowing the budget.
  *   - Budget-skipped ≠ failed: the summary carries "failures":N (real
  *     errors/timeouts — every attempt failed) and "skipped":N (never
  *     attempted, budget) separately, so budget exhaustion can never
  *     masquerade as broken queries. bench_out.json lists the names.
  *   - Queries whose only timing came from a single successful pass
  *     are flagged ("single_pass") so a judge can discount ambient
  *     one-run artifacts (the q114 38× lesson: min-of-passes
  *     protection never engaged for them).
  *   - MIN scoring (round-6 lesson): a single timed pass in a 350+-
  *     execution JVM let one GC pause record q01 at 14× its standalone
  *     time — the min of independent passes is the statistic a pause
  *     can only leave alone, never inflate, and plan cost is
  *     deterministic so the min IS the plan's cost.
  *
  * Robustness (round-1 bench died with executor-heartbeat timeouts and
  * produced no JSON at all):
  *   - each query runs under a watchdog: on timeout its job group is
  *     cancelled, it scores -1, and the run continues;
  *   - heartbeat/network timeouts get generous headroom so a long GC
  *     pause degrades a timing instead of killing the JVM;
  *   - the JSON line is printed from a shutdown hook if the JVM dies
  *     mid-run, with the log level forced to ERROR FIRST so Spark's
  *     own shutdown hooks (Materialized eviction WARN flood) cannot
  *     flush the summary out of the harness's 2000-char stdout tail
  *     even on the abnormal-termination path.
  */
object Bench {
  private val PerQueryTimeoutSec = sys.env.getOrElse("SPARK_GRAFT_Q_TIMEOUT", "150").toInt
  private val GlobalBudgetSec = sys.env.getOrElse("SPARK_GRAFT_BUDGET", "1500").toInt
  private val TimedPasses = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt

  // Locale.ROOT: the f"" interpolator formats in the JVM default
  // locale — a comma-decimal locale would emit invalid JSON
  private[graft] def d3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  private final class QState {
    @volatile var best: Double = -1.0   // min over successful passes
    @volatile var passes: Int = 0       // successful timed passes
    @volatile var attempts: Int = 0     // passes that tried to run it
  }

  private def jarr(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")

  /** The COMPLETE small summary line — everything the driver's gate
    * needs in well under the harness's 2000-char stdout tail.
    * "failures" = queries attempted at least once with zero successful
    * passes; "skipped" = never attempted (budget); "single_pass" =
    * timed queries whose min rests on one pass (count here, names in
    * bench_out.json).
    */
  private def summaryLine(states: Seq[(String, QState)], sfDir: String): String = {
    val total = d3(states.map(_._2.best).filter(_ >= 0).sum)
    val failures = states.count { case (_, s) => s.attempts > 0 && s.passes == 0 }
    val skipped = states.count { case (_, s) => s.attempts == 0 }
    val singlePass = states.count { case (_, s) => s.passes == 1 }
    s"""{"metric":"total","value":$total,"unit":"sec","failures":$failures,"skipped":$skipped,"single_pass":$singlePass,"n_queries":${states.size},"queries_file":"bench_out.json","sf":"$sfDir"}"""
  }

  @volatile private var printed = false
  private def emit(states: Seq[(String, QState)], sfDir: String): Unit = synchronized {
    if (!printed) {
      printed = true
      def line(keyed: Seq[(String, QState)], full: Boolean): String = {
        val qs = keyed
          .map { case (k, s) => "\"" + k + "\":" + d3(s.best) }
          .mkString("{", ",", "}")
        val extra = if (full) {
          val failedNames = keyed.collect { case (k, s) if s.attempts > 0 && s.passes == 0 => k }
          val skippedNames = keyed.collect { case (k, s) if s.attempts == 0 => k }
          val singleNames = keyed.collect { case (k, s) if s.passes == 1 => k }
          s""","failed":${jarr(failedNames)},"skipped":${jarr(skippedNames)},"single_pass":${jarr(singleNames)}"""
        } else ""
        val total = d3(keyed.map(_._2.best).filter(_ >= 0).sum)
        val failures = keyed.count { case (_, s) => s.attempts > 0 && s.passes == 0 }
        val skipped = keyed.count { case (_, s) => s.attempts == 0 }
        // queries FIRST, verdict-bearing fields (value/failures) LAST:
        // the harness captures only the tail of stdout, and with 300+
        // queries the dict alone overflows any fixed window — the tail
        // must always end with the total and failure count. The full
        // (bench_out.json) line carries skipped as a NAME LIST in
        // `extra`; re-emitting the count under the same key would
        // shadow the list, so the count rides under "n_skipped" there.
        val skippedField = if (full) s""""n_skipped":$skipped""" else s""""skipped":$skipped"""
        s"""{"metric":"total","unit":"sec","sf":"$sfDir","queries":$qs$extra,"value":$total,"failures":$failures,$skippedField}"""
      }
      // The harness captures only the LAST 2000 chars of stdout (rounds
      // 2+3 both lost the JSON to that window: "parsed": null; round 7
      // lost it again when 225 short-key timings outgrew the window).
      // stdout gets (1) the SHORT-key per-query line — whatever fits of
      // it lands in the tail fragment for per-round timing diffs — then
      // (2) a COMPLETE small summary line as the very last line, so the
      // window always contains one parseable JSON object carrying the
      // verdict fields. The full-name line is persisted to
      // bench_out.json for humans/judges.
      println(line(states.map { case (k, s) => (k.takeWhile(_ != '_'), s) }, full = false))
      println(summaryLine(states, sfDir))
      System.out.flush()
      try java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_out.json"),
        (line(states, full = true) + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case _: Throwable => () }
    }
  }

  /** Re-print ONLY the small summary line, unguarded: round 13 lost the
    * gate record ("parsed": null) because `spark.stop()` fired the
    * Materialized app-end eviction whose per-artifact
    * localCheckpoint-unpersist WARNs flushed the summary out of the
    * harness's 2000-char stdout tail. The shutdown hook calls this
    * AFTER teardown so the true last stdout line is always the
    * parseable summary, no matter what Spark logs between emit and
    * JVM exit.
    */
  private def emitSummaryLast(states: Seq[(String, QState)], sfDir: String): Unit = {
    println(summaryLine(states, sfDir))
    System.out.flush()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Survive long GC pauses in a loaded harness: a missed heartbeat
      // must degrade a timing, not kill the executor (local mode = the
      // whole JVM). 60s interval x 20 failures = 20 min of grace.
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.executor.heartbeat.maxFailures", "20")
      .config("spark.network.timeout", "1200s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.GraftSession.tune(spark)

    // SPARK_GRAFT_ONLY=q95_contamination,q96_... subsets the run — the
    // fast dev loop for profiling a single query under bench conditions.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    // numeric order: q01..q35 (the SURVEY §2 contract) time first, so a
    // budget collapse truncates the extension board, not the contract
    val names = SparkEntry.queries.keys.toSeq
      .sortBy(n => (Verify.queryNumber(n), n))
      .filter(n => only.forall(_.contains(n)))
    val states = names.map(n => n -> new QState)
    val byName = states.toMap
    // The query the watchdog loop is blocking on RIGHT NOW: if the JVM
    // dies mid-query, that query's in-flight attempt was interrupted by
    // the PROCESS, not broken by the code — the shutdown hook undoes
    // the attempt so an external kill can never invent a "failure"
    // (the same masquerade class as r14's budget-skips-as-failures).
    // A query that also failed an EARLIER pass keeps its failure.
    @volatile var inFlight: String = null
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      // ERROR FIRST: on abnormal termination this hook races Spark's
      // own shutdown hook, whose eviction WARN flood would otherwise
      // land after the summary and flush it out of the stdout tail
      try spark.sparkContext.setLogLevel("ERROR") catch { case _: Throwable => () }
      val f = inFlight
      if (f != null) {
        val st = byName(f)
        if (st.passes == 0 && st.attempts > 0) st.attempts -= 1
      }
      emit(states, sfDir)
      emitSummaryLast(states, sfDir)
    }))

    val pool = Executors.newCachedThreadPool()
    val t0Global = System.nanoTime()
    def elapsedGlobal: Double = (System.nanoTime() - t0Global) / 1e9

    // Runs one query under the watchdog; returns seconds or -1 on
    // error/timeout. Cancelling the job group aborts all of its stages.
    def run(name: String, phase: String): Double = {
      val group = s"$phase-$name"
      val task = new FutureTask[Double](() => {
        spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      })
      pool.execute(task)
      try task.get(PerQueryTimeoutSec, TimeUnit.SECONDS)
      catch {
        case _: TimeoutException =>
          System.err.println(s"[bench] $group TIMED OUT after ${PerQueryTimeoutSec}s; cancelling")
          spark.sparkContext.cancelJobGroup(group)
          task.cancel(true)
          -1.0
        case e: Throwable =>
          System.err.println(s"[bench] $group FAILED: ${e.getMessage}")
          -1.0
      }
    }

    var pass = 0
    var lastPassCost = 0.0
    var continue = true
    while (continue && pass < TimedPasses) {
      pass += 1
      val passT0 = elapsedGlobal
      for (name <- names) {
        if (elapsedGlobal < GlobalBudgetSec) {
          val st = byName(name)
          st.attempts += 1
          inFlight = name
          val s = run(name, s"timed$pass")
          inFlight = null
          if (s >= 0) {
            st.best = if (st.best < 0) s else math.min(st.best, s)
            st.passes += 1
          }
          System.err.println(f"[bench] timed$pass $name%-24s ${s}%.2fs (t+${elapsedGlobal}%.0fs)")
        } else if (byName(name).attempts > 0) {
          // already has at least one attempt — nothing to record
        } else {
          System.err.println(s"[bench] budget exhausted (${GlobalBudgetSec}s); skipping $name")
        }
      }
      lastPassCost = elapsedGlobal - passT0
      // adaptive: a PARTIAL further pass is pure upside — the per-query
      // budget check stops it cleanly, every query it reaches refines
      // its min, and numeric order refines the §2 contract first. Only
      // skip when the remaining budget couldn't improve more than a
      // handful of timings.
      continue = GlobalBudgetSec - elapsedGlobal > 120
      if (!continue && pass < TimedPasses)
        System.err.println(f"[bench] pass ${pass + 1} skipped: last pass cost $lastPassCost%.0fs, " +
          f"remaining ${GlobalBudgetSec - elapsedGlobal}%.0fs under the 120s floor")
    }

    emit(states, sfDir)
    pool.shutdownNow()
    // ERROR before stop: app-end listeners (Materialized eviction)
    // WARN per unpersisted artifact — that flood is what flushed the
    // round-13 summary out of the harness's stdout tail
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
  }
}
