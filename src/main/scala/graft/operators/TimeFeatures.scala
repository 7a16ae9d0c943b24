package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TimeF

/** Derived time features (reference: spark_transform.py:91-109).
  * dayofweek keeps the 1=Sunday..7=Saturday convention the reference's
  * weekend test depends on (spark_transform.py:106, SURVEY §7.4.5).
  * Pure narrow projections — no shuffle, fully codegen'd.
  */
object TimeFeatures {

  def withTimeFeatures(df: DataFrame, tsCol: String = "time"): DataFrame =
    df.withColumn("hour_of_day", TimeF.hourOf(col(tsCol)))
      .withColumn("day_of_week", TimeF.dow(col(tsCol)))
      .withColumn("month", month(col(tsCol)))
      .withColumn("is_weekend", TimeF.isWeekend(col(tsCol)))
      .withColumn("is_business_hours", TimeF.isBusinessHours(col(tsCol)))
}
