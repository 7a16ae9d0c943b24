package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{RollingStats, WarehouseAggregates}

/** The reference's warehouse views registered as temp views over the
  * operator DataFrames (create_dwh_schema.sql:269-336, SURVEY §1.1
  * "Views"): virtual tables — recomputation at query time, with
  * materialization as summary parquet an optimization, not a semantic
  * (SURVEY §3.3).
  */
object Views {

  def register(spark: SparkSession, readings: DataFrame): Unit = {
    readings.createOrReplaceTempView("sensor_readings")
    RollingStats.latestPerKey(readings)
      .createOrReplaceTempView("v_latest_readings")
    WarehouseAggregates.deviceHealth(readings)
      .createOrReplaceTempView("v_device_health_24h")
    WarehouseAggregates.anomalyTrend(readings)
      .createOrReplaceTempView("v_anomaly_trends_7d")
  }
}
