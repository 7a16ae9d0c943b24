package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-event streaming transforms (reference:
  * spark_streaming_consumer.py:131-161): processing metadata, validity,
  * and end-to-end latency.
  */
object StreamTransforms {

  def withProcessingMeta(df: DataFrame): DataFrame =
    df.withColumn("processed_at", current_timestamp())
      .withColumn(
        "is_valid_record",
        col("time").isNotNull && col("device_id").isNotNull && col("value").isNotNull &&
          col("quality_score").between(0, 100))
      .withColumn(
        "latency_seconds",
        col("processed_at").cast("long") - col("time").cast("long"))
}
