package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming dedup and stream-stream correlation — the streaming halves
  * of the batch dedup family (operators.Dedup) and the banded range join
  * (operators.RangeJoin).
  *
  * Scale design: both operators keep state bounded by a watermark.
  * Dedup state is one entry per key seen within the horizon (evicted as
  * the watermark advances) — the only way exact streaming dedup survives
  * unbounded streams. The interval join buffers each side only for the
  * interval + watermark delay; Spark derives the eviction bound from the
  * time-range predicate, so state cannot grow without limit.
  */
object StreamDedupJoin {

  /** Exact streaming deduplication on `keyCols` within the watermark
    * horizon: re-deliveries (at-least-once sources, producer retries)
    * arriving within `delay` of the original are dropped; the key's
    * state is evicted once the watermark passes, keeping state bounded.
    */
  def dedupWithinWatermark(
      df: DataFrame,
      eventTimeCol: String,
      delay: String,
      keyCols: Seq[String]): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Watermarked stream-stream interval join: each left event matched to
    * right events of the same key whose time lies in
    * [left.time - lookbackSec, left.time]. Both sides carry watermarks;
    * the range predicate bounds the join buffer on each side.
    *
    * Columns from the right side are prefixed `r_` to keep the joined
    * schema collision-free.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      lookbackSec: Long,
      delay: String,
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(timeCol, delay).alias("l")
    val r = right.columns
      .foldLeft(right)((df, c) => df.withColumnRenamed(c, s"r_$c"))
      .withWatermark(s"r_$timeCol", delay)
      .alias("r")
    l.join(
      r,
      col(s"l.$keyCol") === col(s"r.r_$keyCol") &&
        col(s"r.r_$timeCol") >= col(s"l.$timeCol") - expr(s"interval $lookbackSec seconds") &&
        col(s"r.r_$timeCol") <= col(s"l.$timeCol"),
      joinType)
  }

  /** Left-outer watermarked interval join: every left event is emitted —
    * matched rows as they join, unmatched rows with null right columns
    * once the watermark proves no match can still arrive. The delayed
    * null emission is the semantic difference from batch left join:
    * correctness requires the state store to hold the left row until
    * the watermark passes its join window, which the time-range
    * predicate bounds.
    */
  def intervalJoinLeftOuter(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      lookbackSec: Long,
      delay: String): DataFrame =
    intervalJoin(left, right, keyCol, timeCol, lookbackSec, delay, "left_outer")
}
