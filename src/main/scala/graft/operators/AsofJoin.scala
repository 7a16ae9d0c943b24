package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join and gap-based sessionization — time-series
  * operators the reference lacks (SURVEY §2.3 "not present"), built by
  * composing existing ops (the preferred strategy before custom plans).
  *
  * Scale design: both are ONE shuffle on the key column. The as-of join
  * is the union + running-last construction — never a range-condition
  * join, which Spark would plan as a broadcast-nested-loop explosion.
  * Skewed keys ride on AQE; at extreme skew, pre-bucket by (key, day).
  */
object AsofJoin {

  /** For each left row, attach the most recent right row at or before
    * its timestamp, per key. Right rows contribute `payloadCols`
    * (surfaced as `asof_<col>`) plus `asof_ts`; timestamp ties resolve
    * right-before-left, then by `rightIdCol` (largest id wins) — fully
    * deterministic.
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightIdCol: String,
      payloadCols: Seq[String]): DataFrame = {

    // The whole right payload rides in ONE struct with ONE
    // last(ignoreNulls) — a right row whose payload field is
    // legitimately NULL can't cause asof_* fields to come from
    // different right rows (the struct itself is never null for a
    // right row, so the newest right row always wins atomically).
    val rightTagged = right
      .select(
        col(keyCol), col(tsCol), col(rightIdCol).cast("long").as("__rid"),
        struct(
          (col(tsCol).as("asof_ts") +:
            payloadCols.map(c => col(c).as(s"asof_$c"))): _*).as("__p"))
      .withColumn("__side", lit(0))
    val leftTagged = left.withColumn("__side", lit(1))

    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    val w = Window
      .partitionBy(keyCol)
      .orderBy(col(tsCol), col("__side"), col("__rid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = unioned
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))

    val unpacked = (Seq("asof_ts") ++ payloadCols.map(c => s"asof_$c"))
      .foldLeft(carried)((df, c) => df.withColumn(c, col(s"__asof.$c")))

    unpacked
      .filter(col("__side") === 1)
      .drop("__p", "__asof", "__side", "__rid")
  }

  /** Gap-based sessionization: a new session starts when the key is idle
    * longer than `gapSeconds`. Returns one row per session with start,
    * end, event count, and duration.
    */
  def sessionize(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      gapSeconds: Long): DataFrame = {
    val order = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    val running = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withSession = events
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(order))
      .withColumn(
        "__new_session",
        when(
          col("__prev_ts").isNull ||
            (unix_timestamp(col(tsCol)) - unix_timestamp(col("__prev_ts"))) > gapSeconds,
          1L).otherwise(0L))
      .withColumn("session_seq", sum(col("__new_session")).over(running))
    withSession
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        (unix_timestamp(max(col(tsCol))) - unix_timestamp(min(col(tsCol))))
          .as("duration_seconds"))
  }
}
