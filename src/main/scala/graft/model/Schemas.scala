package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Canonical schemas for the streaming lane (reference:
  * spark_streaming_consumer.py:33-42; FIXTURES.md A1).
  */
object Schemas {

  /** The 8-field wire schema of a sensor event. `metadata` is kept as a
    * raw JSON string for wire compatibility (the reference consumer
    * declares StringType; SURVEY §1.2) — parse with from_json downstream
    * if structured access is needed.
    */
  val SensorSchema: StructType = StructType(Seq(
    StructField("time", StringType), // ISO-8601; cast to timestamp after parse
    StructField("device_id", StringType),
    StructField("device_type", StringType),
    StructField("value", DoubleType),
    StructField("unit", StringType),
    StructField("quality_score", IntegerType),
    StructField("is_anomaly", BooleanType),
    StructField("metadata", StringType)))
}

/** Typed event for Dataset-boundary APIs and MemoryStream tests. */
case class SensorEvent(
    time: Timestamp,
    device_id: String,
    device_type: String,
    value: Double,
    unit: String,
    quality_score: Int,
    is_anomaly: Boolean,
    metadata: String)
