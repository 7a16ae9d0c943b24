package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Num

/** Robust statistics for quality gating: winsorized means (clip at
  * group percentiles before averaging) and MAD-based outlier detection
  * (median absolute deviation — the robust twin of the z-score operator
  * W5, immune to the outliers it hunts).
  *
  * Scale design: each statistic is a keyed aggregation producing a
  * tiny per-group bound table that broadcast-joins back to the stream —
  * the corpus shuffles once per percentile pass and never sorts
  * globally. Percentile interpolation is the one engine-divergent step,
  * so bounds are rounded at 6 dp BEFORE use; all downstream clip /
  * compare / decimal-mean arithmetic is then bit-identical.
  */
object Robust {

  /** Per-group winsorized mean: clip values into the group's
    * [pLo, pHi] percentile band, then decimal-exact average.
    */
  def winsorizedAvg(df: DataFrame, groupCol: String, valueCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    val bounds = df.groupBy(groupCol).agg(
      round(percentile(col(valueCol), lit(pLo)), 6).as("lo"),
      round(percentile(col(valueCol), lit(pHi)), 6).as("hi"))
    df.join(broadcast(bounds), groupCol)
      .withColumn("clipped", least(greatest(col(valueCol), col("lo")), col("hi")))
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n"),
        first(col("lo")).as("lo"),
        first(col("hi")).as("hi"),
        Num.davg(col(valueCol)).as("raw_avg"),
        Num.davg(col("clipped")).as("winsorized_avg"))
  }

  /** Per-group MAD outlier stats: median, median-absolute-deviation,
    * and the count of values beyond `k` MADs.
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 3.0): DataFrame = {
    val med = df.groupBy(groupCol)
      .agg(round(percentile(col(valueCol), lit(0.5)), 6).as("med"))
    val withDev = df.join(broadcast(med), groupCol)
      .withColumn("adev", abs(col(valueCol) - col("med")))
    val mad = withDev.groupBy(groupCol)
      .agg(round(percentile(col("adev"), lit(0.5)), 6).as("mad"))
    withDev.join(broadcast(mad), groupCol)
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n"),
        first(col("med")).as("med"),
        first(col("mad")).as("mad"),
        sum(when(col("adev") > lit(k) * col("mad"), 1L).otherwise(0L)).as("n_outliers"))
  }
}
