package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Registry over the driver-generated parquet testdata
  * (/root/repo/TESTDATA.md): TPC-H-ish star schema + `events` stream table
  * + `documents`/`embeddings` for the LLM-pipeline operators.
  *
  * Mirrors the reference's multi-source extract orchestration
  * (/root/reference/spark_extract.py:165-214) with parquet in place of
  * JDBC: one entry point returning any table by name, schema normalized.
  *
  * Scale notes: parquet scans here are plain `spark.read.parquet`, so
  * Catalyst pushes filters and prunes columns into the scan
  * (PushedFilters / ReadSchema); at 100 TB the same tables would be
  * date-partitioned directories and the pushdown becomes partition
  * pruning with no code change.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables — always broadcast-join these. */
  val dims: Set[String] = Set("region", "nation")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts has shipped as parquet TIMESTAMP(NANOS) in some testdata
    // generations and TIMESTAMP(MICROS, no tz) in others. Normalize both
    // to a session-UTC TIMESTAMP: nanos arrive as a raw long (nanosAsLong)
    // and truncate to micros — the same truncation DuckDB applies casting
    // TIMESTAMP_NS to TIMESTAMP; micros-no-tz arrives as TIMESTAMP_NTZ and
    // the cast in a UTC-pinned session preserves the wall-clock DuckDB
    // reads, keeping both engines aligned either way.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
    else df
  }

  /** Calendar dimension (reference dim_time,
    * warehouse/create_dwh_schema.sql:39-53 — declared there but never
    * populated by the reference's own loaders): one row per hour
    * covering the events table's full day span. `time_id` is a
    * deterministic 1-based hour index instead of a SERIAL, so the
    * dimension is reproducible and joinable by value on any engine.
    * Generated distributed (sequence + explode over the span) — never a
    * driver loop.
    */
  def dimTime(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TimeF
    apply(spark, dir, "events")
      .agg(
        date_trunc("day", min(col("ts"))).as("d0"),
        date_trunc("day", max(col("ts"))).as("d1"))
      .select(col("d0"),
        explode(sequence(col("d0"), expr("d1 + interval 23 hours"), expr("interval 1 hour")))
          .as("ts_hour"))
      .select(
        (((unix_timestamp(col("ts_hour")) - unix_timestamp(col("d0"))) / 3600) + 1)
          .cast("int").as("time_id"),
        to_date(col("ts_hour")).as("date"),
        hour(col("ts_hour")).cast("int").as("hour"),
        TimeF.dow(col("ts_hour")).cast("int").as("day_of_week"),
        date_format(col("ts_hour"), "EEEE").as("day_name"),
        weekofyear(col("ts_hour")).cast("int").as("week_of_year"),
        month(col("ts_hour")).cast("int").as("month"),
        date_format(col("ts_hour"), "MMMM").as("month_name"),
        quarter(col("ts_hour")).cast("int").as("quarter"),
        year(col("ts_hour")).cast("int").as("year"),
        TimeF.isWeekend(col("ts_hour")).as("is_weekend"),
        TimeF.isBusinessHours(col("ts_hour")).as("is_business_hours"))
  }

  /** Register every table as a temp view (for the Spark SQL surface). */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
    dimTime(spark, dir).createOrReplaceTempView("dim_time")
  }
}
