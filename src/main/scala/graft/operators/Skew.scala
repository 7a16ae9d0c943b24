package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Explicit two-phase (salted) aggregation for skewed group keys
  * (SURVEY §7.4.3). AQE's skew handling covers joins; for aggregations
  * whose hot key overwhelms a single reducer, phase 1 pre-aggregates on
  * (key, salt) and phase 2 combines the partials — the salt is
  * `spark_partition_id()`, so phase 1 is a purely map-local combine and
  * the phase-2 shuffle carries at most `numPartitions` rows per hot key.
  *
  * Sums are decimal-exact (graft.Num convention) so the two-phase result
  * is bit-identical to the direct aggregation regardless of salting.
  */
object Skew {

  private val Dec = DecimalType(38, 6)

  /** count/sum/avg per key, skew-safe. */
  def saltedStats(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame = {
    val partial = df
      .withColumn("__salt", spark_partition_id())
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(
        count(col(valueCol)).as("__n"),
        sum(col(valueCol).cast(Dec)).as("__s"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("__n")).as("n"),
        sum(col("__s")).cast(DoubleType).as("sum_value"))
      .withColumn("avg_value", col("sum_value") / col("n"))
  }

  /** Explicit salted equi-join for a pathologically hot probe-side key —
    * the manual fallback when AQE's skew split cannot help (e.g. the hot
    * key's rows must still meet a non-broadcastable build side). The
    * probe side spreads each key over `r` salts via a deterministic
    * expression (`spread`, e.g. a row id — NEVER rand(), which breaks
    * retry/replay determinism); the build side replicates each row `r`
    * times. Result is row-identical to the plain join by construction:
    * every probe row meets exactly the one build replica carrying its
    * salt. Cost: build side grows r-fold — use for hot-key/medium-dim
    * joins where r * |build| still shuffles comfortably.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String], r: Int,
      spread: Column): DataFrame = {
    require(r > 0, s"salt fan-out must be positive, got $r")
    // NULL spread must not lose the row (pmod(NULL) = NULL would never
    // match a replica): any salt preserves correctness, so route to 0
    val salted = probe.withColumn("__salt",
      coalesce(pmod(spread, lit(r)).cast("int"), lit(0)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(r - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
