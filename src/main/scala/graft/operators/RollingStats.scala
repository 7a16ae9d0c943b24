package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.Num

/** Per-device rolling statistics over event-time range frames and lag
  * features (reference: spark_transform.py:111-146, W1-W4).
  *
  * Scale notes (SURVEY §7.4.3): the range frames shuffle once on
  * device_id and every derived column shares that single Exchange —
  * Catalyst collapses all four window specs onto one sort within the
  * device partition. Skewed devices are handled by AQE; semantics are
  * unchanged. Sums inside the frames are decimal-exact (graft.Num) so
  * results don't depend on intra-frame order.
  */
object RollingStats {

  def withRollingStats(
      df: DataFrame,
      partitionCol: String = "device_id",
      tsCol: String = "time",
      valueCol: String = "value"): DataFrame = {

    val epoch = unix_timestamp(col(tsCol))
    val base = df.withColumn("ts_seconds", epoch)

    val w5m = Window.partitionBy(partitionCol).orderBy(col("ts_seconds")).rangeBetween(-300, 0)
    val w1h = Window.partitionBy(partitionCol).orderBy(col("ts_seconds")).rangeBetween(-3600, 0)
    val v = col(valueCol)

    base
      .withColumn("rolling_avg_5min", round(Num.davgOver(v, w5m), 6))
      .withColumn("rolling_avg_1h", round(Num.davgOver(v, w1h), 6))
      .withColumn("rolling_stddev_1h", round(Num.dstddevOver(v, w1h), 6))
      .withColumn("n_5min", count(v).over(w5m))
  }

  /** Row-frame lag features (W3-W4): previous values and delta. */
  def withLagFeatures(
      df: DataFrame,
      partitionCol: String = "device_id",
      orderCols: Seq[String] = Seq("time", "event_id"),
      valueCol: String = "value"): DataFrame = {
    val w = Window.partitionBy(partitionCol).orderBy(orderCols.map(col): _*)
    df.withColumn("value_lag_1", lag(valueCol, 1).over(w))
      .withColumn("value_lag_2", lag(valueCol, 2).over(w))
      .withColumn("value_change", col(valueCol) - col("value_lag_1"))
  }

  /** Latest reading per key (W7; reference DISTINCT ON view
    * create_dwh_schema.sql:269-280). row_number + filter — Spark plans
    * this as a single shuffle with partial top-1 pushdown (WindowGroupLimit).
    */
  def latestPerKey(
      df: DataFrame,
      keyCol: String = "device_id",
      orderCols: Seq[org.apache.spark.sql.Column] = Seq(col("time").desc, col("event_id").desc)): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }
}

/** Z-score anomaly detection over full-partition windows (reference:
  * spark_transform.py:148-181, W5-W6; threshold config.py:127).
  * The stddev>0 guard is preserved; stats come from exact decimal sums so
  * the z-score is bit-deterministic under any partitioning.
  */
object AnomalyDetection {

  val ZScoreThreshold = 3.0

  def withZScore(
      df: DataFrame,
      partitionCols: Seq[String] = Seq("device_id", "device_type"),
      valueCol: String = "value"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
    val v = col(valueCol)
    val n = count(v).over(w).cast(DoubleType)
    val s = sum(v.cast(org.apache.spark.sql.types.DecimalType(38, 6))).over(w).cast(DoubleType)
    val s2 = sum((v * v).cast(org.apache.spark.sql.types.DecimalType(38, 6))).over(w).cast(DoubleType)
    val mean = s / n
    val stddev = when(
      count(v).over(w) > 1,
      sqrt(greatest(s2 - (s * s) / n, lit(0d)) / (n - lit(1d))))
    df.withColumn("value_mean", mean)
      .withColumn("value_stddev", stddev)
      .withColumn(
        "z_score",
        when(col("value_stddev").isNotNull && col("value_stddev") > 0,
          (v - col("value_mean")) / col("value_stddev")))
      .withColumn(
        "is_anomaly_zscore",
        coalesce(abs(col("z_score")) > ZScoreThreshold, lit(false)))
  }
}
