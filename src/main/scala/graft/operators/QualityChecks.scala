package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Num

/** Data-quality flags and rates (reference: spark_transform.py:183-215,
  * streaming variant spark_streaming_consumer.py:147-153, SQL counterpart
  * analytical_queries.sql:165-179).
  *
  * Scale note: the reference forces two extra jobs to log quality counts
  * (spark_transform.py:209-211); here rates are plain aggregates the
  * caller composes into one pass (SURVEY §7.4.7).
  */
object QualityChecks {

  /** Row-level validity flags (P5): null value, quality outside 0..100. */
  def withValidity(df: DataFrame): DataFrame =
    df.withColumn("has_null_value", col("value").isNull)
      .withColumn(
        "has_invalid_quality",
        col("quality_score").isNull || col("quality_score") < 0 || col("quality_score") > 100)
      .withColumn("is_valid_record", !col("has_null_value") && !col("has_invalid_quality"))

  /** Per-group quality percentages (A11). */
  def qualityRates(df: DataFrame, groupCols: Seq[String]): DataFrame =
    withValidity(df)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_readings"),
        sum(when(col("is_valid_record"), 1L).otherwise(0L)).as("n_valid"),
        round(
          lit(100.0) * sum(when(col("is_valid_record"), 1L).otherwise(0L)) / count(lit(1)),
          6).as("valid_pct"),
        sum(when(col("quality_score") >= 50, 1L).otherwise(0L)).as("n_high_quality"),
        round(
          lit(100.0) * sum(when(col("quality_score") >= 50, 1L).otherwise(0L)) / count(lit(1)),
          6).as("high_quality_pct"),
        round(Num.davg(col("quality_score")), 6).as("avg_quality"))

  /** One declarative data-quality expectation: `pass` iff the aggregate
    * metric is <= `maxAllowed`. Express lower bounds by negating the
    * metric (e.g. `-count(*)` <= -1000 means "at least 1000 rows").
    */
  final case class Expect(name: String, metric: Column, maxAllowed: Double)

  /** Evaluate a set of expectations in ONE aggregation pass over the
    * frame, returning a long-format report row per check (name, metric,
    * bound, pass) — the ingestion gate that decides whether a batch may
    * publish. All metrics are exact counts/ratios, so the report
    * hash-matches a SQL oracle.
    */
  def expectations(df: DataFrame, checks: Seq[Expect]): DataFrame = {
    require(checks.nonEmpty, "at least one expectation required")
    require(checks.map(_.name).distinct.length == checks.length,
      s"duplicate expectation names: ${checks.map(_.name).diff(checks.map(_.name).distinct).mkString(",")}")
    require(checks.forall(c => !c.name.contains(".") && !c.name.contains("`")),
      "expectation names are used as column names — no dots or backticks")
    val aggs = checks.map(c => c.metric.cast("double").as(c.name))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(checks.map { c =>
        struct(
          lit(c.name).as("check_name"),
          col(c.name).as("metric"),
          lit(c.maxAllowed).as("max_allowed"),
          (col(c.name) <= c.maxAllowed).as("pass"))
      }: _*)).as("e"))
      .select("e.*")
  }
}
