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
}
