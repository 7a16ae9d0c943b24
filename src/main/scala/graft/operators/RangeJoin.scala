package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range self-join: all pairs of rows sharing a key whose
  * timestamps lie within a window of each other. The reference has no
  * interval-join operator; this is the standard Spark-first construction
  * (the same bucketing trick Structured Streaming uses for stream-stream
  * interval joins).
  *
  * Scale design: a naive `|t1 - t2| <= w` self-join plans as a
  * broadcast-nested-loop / cartesian per key — quadratic in the hot-key
  * row count. Here every row lands in time bucket floor(sec/w); a
  * qualifying pair spans at most adjacent buckets, so probing with
  * buckets {b, b+1} turns the range predicate into a keyed EQUALITY join
  * on (key, bucket) — one hash shuffle, linear in candidates. AQE's skew
  * handling covers hot (key, bucket) cells.
  */
object RangeJoin {

  /** Pairs (id1 < id2) within `windowSec` seconds of each other, per
    * key. `dt_seconds` is t(id2) - t(id1) (may be negative when the
    * larger id is earlier). Candidate pairs can be found under both
    * role assignments — the final distinct collapses them.
    */
  def selfWithin(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      windowSec: Long): DataFrame = {
    val base = df.select(
      col(keyCol).as("k"),
      unix_timestamp(col(tsCol)).as("sec"),
      col(idCol).as("id"))
    val bkt = floor(col("sec") / windowSec)
    val probe = base.withColumn("bkt", explode(array(bkt, bkt + 1)))
    val build = base.withColumn("bkt", bkt)
    probe.as("a")
      .join(
        build.as("b"),
        col("a.k") === col("b.k") && col("a.bkt") === col("b.bkt") &&
          col("a.id") =!= col("b.id") &&
          abs(col("a.sec") - col("b.sec")) <= windowSec)
      .select(
        col("a.k").as(keyCol),
        least(col("a.id"), col("b.id")).as("id1"),
        greatest(col("a.id"), col("b.id")).as("id2"),
        when(col("a.id") < col("b.id"), col("b.sec") - col("a.sec"))
          .otherwise(col("a.sec") - col("b.sec")).as("dt_seconds"))
      .distinct()
  }
}
