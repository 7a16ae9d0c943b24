package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The skyline (Pareto-frontier) operator (Börzsönyi/Kossmann/Stocker
  * 2001, ICDE — "The Skyline Operator"): the set of rows not DOMINATED
  * by any other row, where d' dominates d iff d' is ≥ d in BOTH
  * dimensions and > in at least one. For corpus curation this is
  * "every document that is best-quality for its length class" — the
  * selection frontier a budget-picker (q204) walks, computed without
  * fixing a quality/length trade-off weight in advance.
  *
  * Scale design: the naive skyline is an all-pairs NOT EXISTS —
  * quadratic and unshippable at 100 TB. Here the corpus-size work is
  * ONE scan + one keyed aggregation (map-side partials):
  *
  *   1. bucket the x dimension with [[Robust.logBin]] (monotone — so
  *      any row in a strictly higher bucket has strictly larger x);
  *   2. per-bucket max-y collapses to a ≤3.7k-row table; a suffix-max
  *      staircase over it (window over the TINY bucket table only)
  *      gives, for each bucket, the best y anywhere to its right;
  *   3. a row survives iff its y ≥ that staircase value — every pruned
  *      row is provably dominated (some higher-bucket row has strictly
  *      larger x AND strictly larger y); survivors ≈ the skyline plus
  *      per-bucket stragglers;
  *   4. the exact dominance test (broadcast left-anti self-join) runs
  *      on survivors only.
  *
  * Contract: the pairwise stage is O(|survivors|²) and the survivor
  * frame is broadcast — the caller accepts that the FRONTIER (the
  * operator's own output) fits an executor, which holds for any
  * correlated-quality corpus; with perfectly anti-correlated dimensions
  * the skyline is output-sized by definition and no algorithm beats
  * quadratic-in-output. x must lie in logBin's [1, 2^62) domain
  * (lengths, counts, sizes); y is any orderable numeric.
  */
object Skyline {

  /** 2-D skyline, both dimensions MAXIMIZED. Keeps `idCol`, `xCol`,
    * `yCol`; ties on both dims keep all tied rows (neither dominates).
    */
  def skyline2(df: DataFrame, idCol: String, xCol: String, yCol: String): DataFrame = {
    val pts = df.select(col(idCol), col(xCol), col(yCol))
      .filter(col(xCol).isNotNull && col(xCol) >= 1 && col(yCol).isNotNull)
      .withColumn("xb", Robust.logBin(col(xCol)))
    val bmax = pts.groupBy("xb").agg(max(col(yCol)).as("by"))
    // suffix max over STRICTLY higher buckets; the unpartitioned window
    // runs over the bucket table (≤3.7k rows), never the data
    val wSuf = Window.orderBy(col("xb").desc).rowsBetween(Window.unboundedPreceding, -1)
    val stair = bmax.withColumn("suf_y", max(col("by")).over(wSuf)).drop("by")
    val cand = pts.join(broadcast(stair), "xb")
      .filter(col("suf_y").isNull || col(yCol) >= col("suf_y"))
      .drop("xb", "suf_y")
    val other = broadcast(cand
      .select(col(xCol).as("ox"), col(yCol).as("oy")))
    val dominates: Column =
      col("ox") >= col(xCol) && col("oy") >= col(yCol) &&
        (col("ox") > col(xCol) || col("oy") > col(yCol))
    cand.join(other, dominates, "left_anti")
  }
}
