package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Monitoring consumer (reference: stream_etl/kafka_consumer.py:23-151,
  * S14): the ops-side tail on the live event stream — running per-type
  * message counts, value stats, anomaly counts, and the latest event
  * time, refreshed continuously to the console.
  *
  * Spark-first shape: where the reference loops a blocking
  * `KafkaConsumer` poll and mutates a driver counter per message
  * (kafka_consumer.py:62-103), this is ONE streaming aggregation in
  * complete mode — counters live in the state store (partitioned,
  * crash-recoverable, exactly-once), the display is the console sink,
  * and the per-message Python loop that caps throughput at one core
  * disappears. The summary transform is a pure DataFrame function, so
  * the identical aggregation is testable on a file/memory stream and on
  * static frames; only the Kafka transport needs a broker (the
  * environment gap documented in COVERAGE.md).
  */
object StreamMonitor {

  /** Running per-device-type summary — the reference's displayed fields
    * (count, last reading, anomaly tally; kafka_consumer.py:80-103) as
    * one streaming-safe aggregation (no windows, update/complete-mode
    * compatible; avg via decimal-backed sum/count so the running value
    * is order-independent).
    */
  def summarize(events: DataFrame): DataFrame =
    events.groupBy(col("device_type"))
      .agg(
        count(lit(1)).as("n_messages"),
        round((sum(col("value").cast("decimal(38,6)")) / count(lit(1))).cast("double"), 6)
          .as("avg_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        count(when(col("is_anomaly"), 1)).as("n_anomalies"),
        max(col("time")).as("last_event_time"))

  /** Live monitor over a Kafka topic (broker required — builder-only in
    * this environment, like every Kafka transport path).
    */
  def monitorKafka(spark: SparkSession, bootstrapServers: String, topic: String,
      intervalSeconds: Int = 5): StreamingQuery =
    start(KafkaJsonSource.parseJson(
      KafkaJsonSource.readStream(spark, bootstrapServers, topic)), intervalSeconds)

  /** The same monitor over a JSONL drop directory — the transport-free
    * twin the specs drive and a useful tail on file-landing pipelines.
    */
  def monitorPath(spark: SparkSession, path: String, intervalSeconds: Int = 5): StreamingQuery =
    start(
      spark.readStream.schema(graft.model.Schemas.SensorSchema).json(path)
        .withColumn("time", col("time").cast("timestamp")),
      intervalSeconds)

  private def start(events: DataFrame, intervalSeconds: Int): StreamingQuery =
    summarize(events).writeStream
      .outputMode(OutputMode.Complete)
      .format("console")
      .option("truncate", "false")
      .trigger(Trigger.ProcessingTime(s"$intervalSeconds seconds"))
      .start()
}
