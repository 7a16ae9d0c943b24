package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maps the driver testdata's `events` table onto the reference's sensor
  * reading shape (/root/repo/FIXTURES.md B: ts→time, user_id→device_id,
  * event_type→device_type, props→metadata), so every downstream operator
  * speaks the reference schema (spark_streaming_consumer.py:33-42).
  *
  * quality_score is lifted out of the JSON metadata (`props.k`, 0..99) and
  * is_anomaly is derived from the event type — the testdata has no native
  * anomaly flag.
  */
object SensorAdapter {

  def fromEvents(events: DataFrame): DataFrame =
    events.select(
      col("ts").as("time"),
      col("user_id").as("device_id"),
      col("event_type").as("device_type"),
      col("value"),
      get_json_object(col("props"), "$.k").cast("int").as("quality_score"),
      (col("event_type") === "error").as("is_anomaly"),
      col("event_id"))

  /** DuckDB CTE mirroring fromEvents — prefix oracle SQL with this. */
  val oracleCte: String =
    """WITH readings AS (
      |  SELECT ts AS time, user_id AS device_id, event_type AS device_type, value,
      |         CAST(json_extract_string(props, '$.k') AS INT) AS quality_score,
      |         (event_type = 'error') AS is_anomaly, event_id
      |  FROM events)
      |""".stripMargin
}
