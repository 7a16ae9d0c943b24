package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Num

/** Time-series regularization: per-key bucket grid with forward-fill
  * (gap filling) and time-weighted averaging — the resampling operators
  * an IoT warehouse needs that the reference computes only implicitly
  * (its continuous aggregates skip empty buckets entirely).
  *
  * Scale design: the grid is generated per key with `sequence()` —
  * distributed, no driver loop; its size is bounded by the key's own
  * time span. Fill is one windowed `last(ignoreNulls)` over the
  * (key)-partitioned grid: a single shuffle by key, linear state.
  */
object Resample {

  /** A single `sequence()` call materializes its whole array in one
    * task; chunking bounds that allocation so one pathological key (a
    * years-long span from a bad timestamp) degrades to many small arrays
    * instead of one OOM-sized one.
    */
  val GridChunkHours = 1000L

  /** Hourly grid per key from the key's first to last bucket, left-join
    * the per-bucket mean, forward-fill misses. `is_gap` marks filled
    * rows.
    */
  def hourlyFfill(df: DataFrame, keyCol: String, tsCol: String, valueCol: String): DataFrame = {
    val hourly = df
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("bucket"))
      .agg(Num.davg(col(valueCol)).as("bucket_avg"))
    // Two-level generation: outer explode yields chunk indices (span /
    // GridChunkHours rows), inner explode yields at most GridChunkHours
    // buckets per chunk — identical rows to a single sequence(h0, h1).
    val grid = hourly
      .groupBy(keyCol)
      .agg(min("bucket").as("h0"), max("bucket").as("h1"))
      .withColumn("span_h",
        ((unix_timestamp(col("h1")) - unix_timestamp(col("h0"))) / 3600L).cast("long"))
      .select(col(keyCol), col("h0"), col("h1"),
        explode(sequence(lit(0L), (col("span_h") / GridChunkHours).cast("long"))).as("chunk"))
      .select(col(keyCol),
        // interval * bigint (not a CAST-to-int hour count, which would
        // wrap negative once the span exceeds 2^31 hours — exactly the
        // corrupted-timestamp scenario this chunking exists to survive)
        explode(sequence(
          expr(s"h0 + chunk * INTERVAL '$GridChunkHours' HOUR"),
          least(col("h1"),
            expr(s"h0 + (chunk + 1) * INTERVAL '$GridChunkHours' HOUR - INTERVAL '1' HOUR")),
          expr("interval 1 hour"))).as("bucket"))
    val w = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(hourly, Seq(keyCol, "bucket"), "left")
      .select(
        col(keyCol),
        col("bucket"),
        col("bucket_avg").isNull.as("is_gap"),
        last(col("bucket_avg"), ignoreNulls = true).over(w).as("value_filled"))
  }

  /** Per-key time-weighted mean: each reading weighted by the seconds
    * until the key's next reading (the last reading carries no weight —
    * its holding interval is unknown). One window pass + one aggregate,
    * both keyed by `keyCol`.
    */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    val withDt = df
      .withColumn("__sec", unix_timestamp(col(tsCol)))
      .withColumn("__dt", lead(col("__sec"), 1).over(w) - col("__sec"))
    withDt
      .groupBy(keyCol)
      .agg(
        count(col("__dt")).as("n_intervals"),
        sum(col("__dt")).as("total_seconds"),
        (Num.dsum(col(valueCol) * col("__dt")) / sum(col("__dt"))).as("twavg"))
  }
}
