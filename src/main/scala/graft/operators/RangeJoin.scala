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

  /** Interval-overlap SELF-join per key — the interval×interval member
    * of the range-join family (the shape behind temporal concurrency /
    * resource-conflict queries): pairs (id1 < id2) whose [s, e)
    * second-intervals intersect, via time-GRID decomposition. Each
    * interval lands on the `gridSec` buckets it touches, candidates
    * join on (key, bucket) — never an unbounded per-key self-join —
    * and a bucket's candidate volume is (concurrent intervals)², the
    * overlap join's inherent output size. The final distinct collapses
    * pairs that co-touch several buckets; overlap uses the standard
    * end-exclusive s1 < e2 AND s2 < e1 test, so touching intervals do
    * not pair. Inputs are NUMERIC seconds columns (callers convert
    * timestamps; open ends must be capped first — NULL ends never
    * match).
    */
  def intervalOverlapSelf(
      df: DataFrame,
      keyCol: String,
      startSecCol: String,
      endSecCol: String,
      idCol: String,
      gridSec: Long): DataFrame = {
    val span = df.select(
      col(keyCol).as("k"),
      col(startSecCol).cast("long").as("s"),
      col(endSecCol).cast("long").as("e"),
      col(idCol).as("id"))
      .filter(col("s") < col("e")) // empty intervals can overlap nothing
      .withColumn("bkt",
        explode(sequence(floor(col("s") / gridSec), floor((col("e") - 1) / gridSec))))
    span.as("a")
      .join(span.as("b"),
        col("a.k") === col("b.k") && col("a.bkt") === col("b.bkt") &&
          col("a.id") < col("b.id") &&
          col("a.s") < col("b.e") && col("b.s") < col("a.e"))
      .select(
        col("a.k").as(keyCol),
        col("a.id").as("id1"),
        col("b.id").as("id2"),
        (least(col("a.e"), col("b.e")) - greatest(col("a.s"), col("b.s")))
          .as("overlap_seconds"))
      .distinct()
  }
}
