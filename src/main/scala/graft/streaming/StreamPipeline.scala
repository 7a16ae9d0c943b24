package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** End-to-end streaming pipeline orchestration (reference:
  * spark_streaming_consumer.py:281-350, §3.2): one parsed source lineage
  * fanned into two branches — raw validated events (append) and 1-minute
  * windowed aggregates (update-mode upsert) — each independently
  * checkpointed, plus an optional console debug branch.
  */
class StreamPipeline(
    spark: SparkSession,
    outDir: String,
    checkpointRoot: String,
    watermark: Option[String] = Some(StreamAggregates.DefaultWatermark)) {

  /** Start both branches from an already-parsed streaming frame (any
    * byte source: Kafka via KafkaJsonSource, MemoryStream in tests).
    */
  def start(parsed: DataFrame): Seq[StreamingQuery] = {
    val transformed = StreamTransforms.withProcessingMeta(parsed)

    val raw = transformed
      .filter(col("is_valid_record"))
      .select("time", "device_id", "device_type", "value", "unit",
        "quality_score", "is_anomaly", "metadata")
    val rawQuery = StreamSinks
      .parquetAppend(raw, s"$outDir/sensor_readings", s"$checkpointRoot/raw_data")
      .start()

    val agg = StreamAggregates.windowedAggregates(
      transformed.filter(col("is_valid_record")), watermark = watermark)
    val aggQuery = StreamSinks
      .parquetUpsert(agg, s"$outDir/sensor_readings_stream_agg",
        Seq("window_start", "device_id", "device_type"), s"$checkpointRoot/windowed_agg")
      .start()

    Seq(rawQuery, aggQuery)
  }

  /** Kafka entry point (needs a broker). */
  def startFromKafka(bootstrapServers: String, topic: String): Seq[StreamingQuery] =
    start(KafkaJsonSource.parseJson(KafkaJsonSource.readStream(spark, bootstrapServers, topic)))

  def awaitAny(): Unit = spark.streams.awaitAnyTermination()

  def stopAll(queries: Seq[StreamingQuery]): Unit = queries.foreach(_.stop())
}

object StreamPipeline {

  /** Stream-static enrichment: each streaming row left-joins a STATIC
    * dimension, broadcast so no stream-side shuffle or state store is
    * involved (stream-static joins are stateless by definition — the
    * static side is re-resolved per micro-batch, which is also how a
    * slowly-refreshed dim file picks up changes between batches).
    * Unmatched rows keep null dim columns: enrichment must never drop
    * an event.
    */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")
}
