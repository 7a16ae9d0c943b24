package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Scale notes (100 TB design): AQE is on so skewed shuffles are split and
  * small partitions coalesced at runtime; shuffle partitions default to 32
  * for local[32] but on a real cluster this is expected to be overridden
  * (or left to AQE's coalescing with a high initial partition number).
  * Session time zone is pinned to UTC — the reference stores TIMESTAMPTZ
  * and computes wall-clock features in UTC (see /root/reference/
  * create_dwh_schema.sql:61, spark_transform.py:103-107).
  */
object GraftSession {

  def builder(
      master: String = "local[*]",
      shufflePartitions: Int = 32,
      appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .master(master)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // The driver testdata's events.ts is parquet TIMESTAMP(NANOS), which
      // Spark cannot represent natively; read as long and convert (Tables).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Local session for tests and ad-hoc runs. */
  def local(cores: Int = 4): SparkSession = {
    val s = builder(master = s"local[$cores]", shufflePartitions = cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Apply runtime confs that queries rely on to an externally-built
    * session (e.g. the driver's Verify/Bench session). All of these are
    * runtime-settable SQL confs.
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // Right-size shuffles for local[N] if the session still has Spark's
    // stock default (don't fight an explicit setting from Verify/Bench).
    if (spark.conf.get("spark.sql.shuffle.partitions") == "200")
      spark.conf.set("spark.sql.shuffle.partitions", "32")
    GraftExtensions.registerAll(spark)
    // Extension optimizer rules can't be injected post-hoc; the
    // experimental hook covers externally-built sessions.
    if (!spark.experimental.extraOptimizations.contains(graft.plans.DotProductRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.DotProductRewrite
    if (!spark.experimental.extraOptimizations.contains(graft.plans.BandJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.BandJoinRewrite
    spark
  }
}
