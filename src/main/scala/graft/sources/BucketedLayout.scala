package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed storage layout for co-located joins and aggregations —
  * the 100 TB answer to "this fact-to-fact join shuffles 100 TB every
  * run". Writing both sides bucketed by the join key (same bucket
  * count) lets Spark plan the join with ZERO Exchange: each task reads
  * matching buckets from both sides. Same for aggregations on the
  * bucket key — no shuffle before the final aggregate.
  *
  * This is the parquet analog of the reference warehouse's
  * segmentby-(device_id, device_type) chunking (TimescaleDB compression
  * policy, create_dwh_schema.sql:240-248): physical co-location by the
  * hot grouping key.
  *
  * Bucketing metadata lives in the session catalog (saveAsTable), so
  * readers must go through `spark.table(name)` — a plain path read sees
  * ordinary parquet and keeps shuffling.
  */
object BucketedLayout {

  /** Persist `df` bucketed (and sorted) by `keys` into the session
    * warehouse as `tableName`.
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      numBuckets: Int,
      keys: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(tableName)

  def table(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)
}
