package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** Kafka JSON sensor-event source (reference:
  * spark_streaming_consumer.py:94-129, S6-S7).
  *
  * The JSON-parse stage is a pure DataFrame transform so it is testable
  * on static frames and reusable by any byte source; only `readStream`
  * needs a broker.
  */
object KafkaJsonSource {

  /** Streaming source: earliest offsets, tolerant of data loss (T10). */
  def readStream(
      spark: SparkSession,
      bootstrapServers: String,
      topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("failOnDataLoss", "false")
      .load()

  /** CAST(value AS STRING) -> from_json(SensorSchema) -> flatten, keeping
    * the broker ingest timestamp; ISO time string cast to event-time
    * timestamp (spark_streaming_consumer.py:113-126).
    */
  def parseJson(kafkaFrame: DataFrame): DataFrame =
    kafkaFrame
      .selectExpr("CAST(value AS STRING) AS json_str", "timestamp AS kafka_timestamp")
      .select(from_json(col("json_str"), Schemas.SensorSchema).as("data"), col("kafka_timestamp"))
      .select(col("data.*"), col("kafka_timestamp"))
      .withColumn("time", col("time").cast("timestamp"))

  /** The write-side inverse of parseJson: events serialized to the
    * 8-field JSON wire format, keyed by device_id (the reference
    * producer's partitioning key, kafka_producer.py:80-137). A pure
    * transform — attach to writeStream.format("kafka") (needs a
    * broker) or assert on it statically.
    */
  def toJson(events: DataFrame): DataFrame =
    events.select(
      col("device_id").cast("string").as("key"),
      to_json(struct(
        date_format(col("time"), "yyyy-MM-dd'T'HH:mm:ssxxx").as("time"),
        col("device_id"), col("device_type"), col("value"), col("unit"),
        col("quality_score"), col("is_anomaly"), col("metadata"))).as("value"))

  /** Streaming Kafka sink builder (S13 write side; broker required). */
  def writeStream(events: DataFrame, bootstrapServers: String, topic: String,
      checkpointDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    toJson(events).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)
}
