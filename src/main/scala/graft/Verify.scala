package graft
import java.nio.file.{Files, Paths}
import java.util.concurrent.{Executors, FutureTask, TimeUnit, TimeoutException}

import org.apache.spark.sql.SparkSession

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Robust to a single bad query: failures are logged and skipped, and a
  * watchdog cancels any query that hangs (same lesson as Bench — a
  * planning explosion must cost one query, not the whole gate).
  */
object Verify {
  private val PerQueryTimeoutSec = sys.env.getOrElse("SPARK_GRAFT_Q_TIMEOUT", "300").toInt

  // Dev-loop subset: SPARK_GRAFT_ONLY=q65_ann_ivf,q67_embed_centroids
  // restricts the dump (and oracle json) to the named queries.
  private val Only: Option[Set[String]] =
    sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
  private def selected[V](m: Map[String, V]): Map[String, V] =
    Only.map(s => m.view.filterKeys(s).toMap).getOrElse(m)

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.GraftSession.tune(spark)
    new java.io.File(outDir).mkdirs()
    val pool = Executors.newCachedThreadPool()
    selected(SparkEntry.queries).foreach { case (name, fn) =>
      val task = new FutureTask[Unit](() => {
        spark.sparkContext.setJobGroup(s"verify-$name", name, interruptOnCancel = true)
        fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      })
      pool.execute(task)
      try task.get(PerQueryTimeoutSec, TimeUnit.SECONDS)
      catch {
        case _: TimeoutException =>
          System.err.println(s"[verify] $name TIMED OUT after ${PerQueryTimeoutSec}s; cancelling")
          spark.sparkContext.cancelJobGroup(s"verify-$name")
          task.cancel(true)
        case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // several operators cache shared subtrees (minhash signatures,
      // shingle sets, band tables) and leave lifecycle to the caller;
      // over a 130+-query run those pins would accumulate to real
      // executor memory, so drop them once the query's output is on disk
      spark.catalog.clearCache()
    }
    pool.shutdownNow()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = selected(SparkEntry.oracleSql)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // silence the app-end eviction WARN flood (the round-13 bench-tail
    // lesson) so any stdout the driver tails stays meaningful
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
  }
}
