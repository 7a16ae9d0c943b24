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
    // Each overlapping pair co-touches every bucket its intersection
    // spans; emitting it from exactly ONE — the bucket owning the later
    // start (both intervals provably touch it) — replaces the
    // pairs×shared-buckets dedup shuffle a distinct() would need with a
    // free join-side predicate. On long-dwell data (intervals ≫ grid)
    // that dedup input is 10-20× the pair set — the difference between
    // output-bound and pathological.
    span.as("a")
      .join(span.as("b"),
        col("a.k") === col("b.k") && col("a.bkt") === col("b.bkt") &&
          col("a.id") < col("b.id") &&
          col("a.s") < col("b.e") && col("b.s") < col("a.e") &&
          col("a.bkt") === floor(greatest(col("a.s"), col("b.s")) / gridSec))
      .select(
        col("a.k").as(keyCol),
        col("a.id").as("id1"),
        col("b.id").as("id2"),
        (least(col("a.e"), col("b.e")) - greatest(col("a.s"), col("b.s")))
          .as("overlap_seconds"))
  }

  /** Aggregate concurrency profile per key WITHOUT materializing pairs —
    * the sweep-line twin of [[intervalOverlapSelf]] for the aggregate
    * reads (pair count, total pairwise-overlap seconds, peak
    * concurrency). The pair join's output is inherently (concurrent
    * intervals)²; on dense-concurrency data that is the whole cost, and
    * no listing algorithm beats it. This sweep is linear in
    * interval×bucket rows instead: intervals CLAMP to the grid buckets
    * they touch, each (key, bucket) sweeps its local events in time
    * order (a window bounded by the bucket's event count — never a
    * per-key sort), and
    *  - a TRUE start (not a clamped bucket re-entry) counts C−1 new
    *    pairs — each overlapping pair exactly once, at the later
    *    interval's start;
    *  - every inter-event segment integrates C·(C−1)/2 seconds of
    *    pairwise overlap (the integral splits exactly at bucket edges,
    *    so clamped summation is lossless);
    *  - peak concurrency is max C (every live interval is clamped into
    *    every bucket it spans, so local C IS global C).
    * End-exclusive semantics: at equal t, ends sort before starts
    * (touching intervals neither pair nor overlap), and clamped
    * re-entries sort before true starts (a carry-in is already active
    * when a pair's later member starts at the bucket edge).
    */
  def intervalConcurrency(
      df: DataFrame,
      keyCol: String,
      startSecCol: String,
      endSecCol: String,
      idCol: String,
      gridSec: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val span = df.select(
      col(keyCol).as("k"),
      col(startSecCol).cast("long").as("s"),
      col(endSecCol).cast("long").as("e"),
      col(idCol).as("id"))
      .filter(col("s") < col("e"))
      .withColumn("bkt",
        explode(sequence(floor(col("s") / gridSec), floor((col("e") - 1) / gridSec))))
    val clamped = span.select(
      col("k"), col("bkt"), col("id"),
      greatest(col("s"), col("bkt") * gridSec).as("cs"),
      least(col("e"), (col("bkt") + 1) * gridSec).as("ce"),
      (col("s") >= col("bkt") * gridSec).as("true_start"))
    val ev = clamped
      .select(col("k"), col("bkt"), col("id"), col("cs").as("t"),
        lit(1L).as("d"), when(col("true_start"), 1L).otherwise(0L).as("ts"))
      .unionByName(clamped
        .select(col("k"), col("bkt"), col("id"), col("ce").as("t"),
          lit(-1L).as("d"), lit(0L).as("ts")))
    val w = Window.partitionBy("k", "bkt")
      .orderBy(col("t"), col("d"), col("ts"), col("id"))
    val swept = ev
      .withColumn("cc", sum(col("d")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("seg", coalesce(lead(col("t"), 1).over(w), col("t")) - col("t"))
    swept.groupBy(col("k").as(keyCol))
      .agg(
        sum(when(col("d") === 1 && col("ts") === 1, col("cc") - 1).otherwise(0L))
          .as("n_pairs"),
        sum(shiftright(col("cc") * (col("cc") - 1), 1) * col("seg"))
          .as("total_overlap_seconds"),
        max(col("cc")).as("peak_concurrency"))
  }
}
