package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Num, TimeF}

/** Warehouse-layer aggregates: the reference's continuous aggregates,
  * views, and table function re-expressed as batch Spark jobs
  * (/root/reference/warehouse/create_dwh_schema.sql:142-375, SURVEY
  * §2.4-§2.5).
  *
  * All are hash aggregations over low-cardinality keys: partial (map-side)
  * aggregation handles the 100 TB fan-in, and the final shuffle moves one
  * row per (bucket × device) group. Percentiles use Spark's exact
  * `percentile` (Postgres PERCENTILE_CONT parity, SURVEY §7.3); swap in
  * `percentile_approx` at extreme scale where exact per-group buffering
  * is unaffordable.
  */
object WarehouseAggregates {

  private def anomalyCount: Column =
    sum(when(col("is_anomaly"), 1L).otherwise(0L)).as("anomaly_count")

  /** Hourly continuous aggregate (A3; create_dwh_schema.sql:142-170). */
  def hourlyAgg(readings: DataFrame): DataFrame =
    readings
      .groupBy(
        date_trunc("hour", col("time")).as("bucket"),
        col("device_type"))
      .agg(
        count(lit(1)).as("reading_count"),
        round(Num.davg(col("value")), 6).as("avg_value"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        round(Num.dstddev(col("value")), 6).as("stddev_value"),
        round(percentile(col("value"), lit(0.5)), 6).as("median_value"),
        round(percentile(col("value"), lit(0.95)), 6).as("p95_value"),
        anomalyCount,
        round(Num.davg(col("quality_score")), 6).as("avg_quality_score"))
      .withColumn("bucket", col("bucket").cast("timestamp_ntz"))

  /** 100 TB-scale variant of hourlyAgg: percentile_approx (bounded-memory
    * sketch, mergeable across partitions) instead of the exact sort-based
    * percentile, which buffers whole groups. `accuracy` trades memory for
    * error (default 10000 ≈ 0.01% rank error). Everything else identical.
    */
  def hourlyAggApprox(readings: DataFrame, accuracy: Int = 10000): DataFrame =
    readings
      .groupBy(date_trunc("hour", col("time")).as("bucket"), col("device_type"))
      .agg(
        count(lit(1)).as("reading_count"),
        round(Num.davg(col("value")), 6).as("avg_value"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        round(Num.dstddev(col("value")), 6).as("stddev_value"),
        percentile_approx(col("value"), lit(0.5), lit(accuracy)).as("median_value"),
        percentile_approx(col("value"), lit(0.95), lit(accuracy)).as("p95_value"),
        anomalyCount,
        round(Num.davg(col("quality_score")), 6).as("avg_quality_score"))
      .withColumn("bucket", col("bucket").cast("timestamp_ntz"))

  /** Daily continuous aggregate with business-hours conditional means
    * (A4; create_dwh_schema.sql:173-209). Spark's avg skips nulls,
    * matching SQL AVG(CASE WHEN ...) semantics.
    */
  def dailyAgg(readings: DataFrame): DataFrame = {
    val bh = when(TimeF.isBusinessHours(col("time")), col("value"))
    val nbh = when(!TimeF.isBusinessHours(col("time")), col("value"))
    readings
      .groupBy(date_trunc("day", col("time")).as("bucket"), col("device_type"))
      .agg(
        count(lit(1)).as("reading_count"),
        round(Num.davg(col("value")), 6).as("avg_value"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        round(Num.davg(bh), 6).as("avg_value_business_hours"),
        round(Num.davg(nbh), 6).as("avg_value_off_hours"),
        anomalyCount)
      .withColumn("bucket", col("bucket").cast("timestamp_ntz"))
  }

  /** Device health over the trailing 24 h (A5; the v_device_health_24h
    * view, create_dwh_schema.sql:283-305). "Now" is injectable for
    * deterministic tests (SURVEY §7.4.4) and defaults to max(time).
    */
  def deviceHealth(readings: DataFrame, now: Option[Column] = None): DataFrame = {
    val clock = now.getOrElse(max(col("time")))
    val withNow = readings.crossJoin(broadcast(readings.agg(clock.as("now_ts"))))
    withNow
      .filter(col("time") > col("now_ts") - expr("INTERVAL 24 HOURS"))
      .groupBy("device_id")
      .agg(
        count(lit(1)).as("reading_count"),
        round(Num.davg(col("value")), 6).as("avg_value"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        round(Num.davg(col("quality_score")), 6).as("avg_quality_score"),
        anomalyCount,
        max("time").as("last_reading_at"),
        (first(unix_timestamp(col("now_ts"))) - unix_timestamp(max(col("time"))))
          .as("seconds_since_last"))
      .withColumn("last_reading_at", col("last_reading_at").cast("timestamp_ntz"))
  }

  /** Hourly anomaly-rate trend (A6; v_anomaly_trends_7d,
    * create_dwh_schema.sql:308-336).
    */
  def anomalyTrend(readings: DataFrame): DataFrame =
    readings
      .groupBy(date_trunc("hour", col("time")).as("bucket"), col("device_type"))
      .agg(
        count(lit(1)).as("reading_count"),
        anomalyCount,
        round(
          lit(100.0) * sum(when(col("is_anomaly"), 1L).otherwise(0L)) / count(lit(1)),
          6).as("anomaly_rate_pct"))
      .withColumn("bucket", col("bucket").cast("timestamp_ntz"))

  /** Hour-of-day activity profile (A8; analytical_queries.sql:59-69). */
  def hourProfile(readings: DataFrame): DataFrame =
    readings
      .groupBy(TimeF.hourOf(col("time")).as("hour_of_day"), col("device_type"))
      .agg(
        count(lit(1)).as("reading_count"),
        round(Num.davg(col("value")), 6).as("avg_value"),
        round(Num.dstddev(col("value")), 6).as("stddev_value"))

  /** Weekend vs weekday comparison (A9; analytical_queries.sql:71-84). */
  def weekendCompare(readings: DataFrame): DataFrame =
    readings
      .groupBy(col("device_type"), TimeF.isWeekend(col("time")).as("is_weekend"))
      .agg(
        count(lit(1)).as("reading_count"),
        round(Num.davg(col("value")), 6).as("avg_value"),
        round(Num.davg(col("quality_score")), 6).as("avg_quality_score"))

  /** Business-hours vs off-hours delta per device type (A10;
    * analytical_queries.sql:149-163).
    */
  def businessHoursDiff(readings: DataFrame): DataFrame = {
    val bh = when(TimeF.isBusinessHours(col("time")), col("value"))
    val nbh = when(!TimeF.isBusinessHours(col("time")), col("value"))
    readings
      .groupBy("device_type")
      .agg(
        round(Num.davg(bh), 6).as("avg_business_hours"),
        round(Num.davg(nbh), 6).as("avg_off_hours"))
      .withColumn(
        "business_hours_delta",
        round(col("avg_business_hours") - col("avg_off_hours"), 6))
  }

  /** Parameterized device stats over a time range (A13; the plpgsql table
    * function dwh.get_device_stats, create_dwh_schema.sql:343-375) —
    * a plain Scala method returning a single-row DataFrame.
    */
  def deviceStats(readings: DataFrame, deviceId: Column, start: Column, end: Column): DataFrame =
    readings
      .filter(col("device_id") === deviceId && col("time").between(start, end))
      .groupBy("device_id")
      .agg(
        count(lit(1)).as("reading_count"),
        round(Num.davg(col("value")), 6).as("avg_value"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        round(Num.dstddev(col("value")), 6).as("stddev_value"),
        anomalyCount,
        round(Num.davg(col("quality_score")), 6).as("avg_quality_score"))

  /** Batch equivalent of the streaming 1-minute tumbling window aggregate
    * (A1/T1; spark_streaming_consumer.py:163-210) — same window() call the
    * streaming lane uses, so batch and stream results are comparable.
    */
  def minuteWindowAgg(readings: DataFrame): DataFrame =
    readings
      .groupBy(window(col("time"), "1 minute"), col("device_id"), col("device_type"))
      .agg(
        count(lit(1)).as("reading_count"),
        round(Num.davg(col("value")), 6).as("avg_value"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        round(Num.dstddev(col("value")), 6).as("stddev_value"),
        anomalyCount,
        round(Num.davg(col("quality_score")), 6).as("avg_quality_score"))
      .select(
        col("window.start").cast("timestamp_ntz").as("window_start"),
        col("window.end").cast("timestamp_ntz").as("window_end"),
        col("device_id"), col("device_type"), col("reading_count"),
        col("avg_value"), col("min_value"), col("max_value"),
        col("stddev_value"), col("anomaly_count"), col("avg_quality_score"))
}
