package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Num

/** Streaming windowed aggregation (A1/T1-T2; reference:
  * spark_streaming_consumer.py:163-210): 1-minute tumbling event-time
  * windows per (device_id, device_type) with the full metric set.
  *
  * Watermark: the reference runs WITHOUT one — unbounded state, late data
  * always accepted (T2). That is reproduced when `watermark = None`; the
  * engine default bounds state with a 10-minute watermark, which is the
  * only sane configuration at 100 TB (SURVEY §7.4.2). Same physical plan
  * either way: partial aggregation feeding the streaming state store,
  * keyed by (window, device_id, device_type).
  *
  * The exact same function works on batch frames (watermark ignored),
  * which is how the ScalaTest suite proves stream==batch equivalence.
  */
object StreamAggregates {

  val DefaultWatermark = "10 minutes"

  def windowedAggregates(
      events: DataFrame,
      windowLength: String = "1 minute",
      watermark: Option[String] = Some(DefaultWatermark)): DataFrame = {
    val src = watermark match {
      case Some(w) if events.isStreaming => events.withWatermark("time", w)
      case _ => events
    }
    src
      .groupBy(window(col("time"), windowLength), col("device_id"), col("device_type"))
      .agg(
        count(lit(1)).as("reading_count"),
        round(Num.davg(col("value")), 6).as("avg_value"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        round(Num.dstddev(col("value")), 6).as("stddev_value"),
        sum(when(col("is_anomaly"), 1L).otherwise(0L)).as("anomaly_count"),
        round(Num.davg(col("quality_score")), 6).as("avg_quality_score"),
        round(Num.davg(col("latency_seconds")), 6).as("avg_latency_seconds"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("device_id"), col("device_type"), col("reading_count"),
        col("avg_value"), col("min_value"), col("max_value"), col("stddev_value"),
        col("anomaly_count"), col("avg_quality_score"), col("avg_latency_seconds"))
  }

  /** Streaming per-window LEADERBOARD: the top-k readings by value per
    * (window, device_type), through the mergeable TopKByScore
    * aggregate — per open window-group the state store holds exactly
    * the k-entry heap buffer (merged across micro-batches by the same
    * heap merge the batch shuffle uses), never the events: a windowed
    * rank that needs NO sort and NO per-event retention, which a
    * row_number window simply cannot express on a stream. Late
    * in-watermark events re-emit their window with the heap updated —
    * the T8 upsert contract. The same function runs on batch frames
    * (watermark ignored), which is how the spec proves stream ≡ batch.
    * Output: one row per (window, device_type) with `top` =
    * array<struct<score, id>> in (value DESC, id ASC) order.
    */
  def windowedTopK(
      events: DataFrame,
      idCol: String,
      k: Int = 3,
      windowLength: String = "1 minute",
      watermark: Option[String] = Some(DefaultWatermark)): DataFrame = {
    val src = watermark match {
      case Some(w) if events.isStreaming => events.withWatermark("time", w)
      case _ => events
    }
    src
      .groupBy(window(col("time"), windowLength), col("device_type"))
      .agg(graft.functions.Sketch.topKByScore(col("value"), col(idCol), k).as("top"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("device_type"), col("top"))
  }
}
