package graft.batch

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.operators._

/** Batch-lane orchestration (reference: run_batch_pipeline.py §3.1):
  * extract → enrich → time features → rolling stats → anomaly detection →
  * quality flags → dimensional load. All phases build ONE lazy lineage;
  * the single action is the sink write (the reference forces >=6 extra
  * jobs with logging counts — SURVEY §7.4.7 — here metrics ride along via
  * observe()).
  *
  * Sinks are parquet-first (date-partitioned fact = the reference's
  * hypertable chunking); Connectors.writeJdbc slots in for JDBC parity.
  */
class BatchPipeline(outDir: String) {

  /** Full transform lineage over sensor-shaped readings. */
  def transform(readings: DataFrame): DataFrame = {
    val enriched = TimeFeatures.withTimeFeatures(readings)
    val rolled = RollingStats.withLagFeatures(
      RollingStats.withRollingStats(enriched),
      orderCols = Seq("time", "event_id"))
    val flagged = QualityChecks.withValidity(
      AnomalyDetection.withZScore(rolled))
    flagged.withColumn(
      "is_anomaly_combined",
      col("is_anomaly") || col("is_anomaly_zscore"))
  }

  /** Fact load (S9): valid rows only, the reference's 16-column shape,
    * stamped and date-partitioned for pruning at query time.
    */
  def loadFact(transformed: DataFrame): Unit =
    transformed
      .filter(col("is_valid_record"))
      .select(
        col("time"), col("device_id"), col("device_type"), col("value"),
        col("quality_score"), col("is_anomaly_combined"),
        col("rolling_avg_5min"), col("rolling_avg_1h"),
        col("value_lag_1"), col("value_change"),
        col("hour_of_day"), col("day_of_week"),
        col("is_weekend"), col("is_business_hours"), col("is_valid_record"),
        current_timestamp().as("etl_loaded_at"))
      .withColumn("date", to_date(col("time")))
      .repartition(col("date"))
      .write.mode(SaveMode.Append)
      .partitionBy("date")
      .parquet(s"$outDir/fact_sensor_readings_enriched")

  /** Dimension load (S10): full refresh. */
  def loadDimension(dim: DataFrame, name: String): Unit =
    dim.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name")

  /** End-to-end run with quality metrics observed in the same pass —
    * observed metrics surface on the EXECUTED plan (the writer command),
    * so they are captured with a QueryExecutionListener rather than a
    * second job (SURVEY §7.4.7).
    */
  def run(readings: DataFrame): Map[String, Long] = {
    val transformed = transform(readings)
    val observed = transformed.observe(
      "quality",
      count(lit(1)).as("n_total"),
      sum(when(!col("is_valid_record"), 1L).otherwise(0L)).as("n_invalid"),
      sum(when(col("is_anomaly_combined"), 1L).otherwise(0L)).as("n_anomalies"))

    val spark = readings.sparkSession
    @volatile var captured: Option[org.apache.spark.sql.Row] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.get("quality").foreach(r => captured = Some(r))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      loadFact(observed)
      val deadline = System.currentTimeMillis() + 30000
      while (captured.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
    } finally spark.listenerManager.unregister(listener)

    captured match {
      case Some(row) => Map(
        "n_total" -> row.getAs[Long]("n_total"),
        "n_invalid" -> row.getAs[Long]("n_invalid"),
        "n_anomalies" -> row.getAs[Long]("n_anomalies"))
      case None => Map.empty
    }
  }
}
