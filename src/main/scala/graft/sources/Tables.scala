package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
    // events.ts is parquet TIMESTAMP(NANOS): Spark has no nanosecond
    // timestamp type, so it is read as a raw long (nanosAsLong) and
    // truncated to microseconds here — the same truncation DuckDB applies
    // when casting TIMESTAMP_NS to TIMESTAMP, keeping both engines aligned.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view (for the Spark SQL surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
