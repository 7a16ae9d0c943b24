package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.functions._

/** Bloom-prefiltered semi join — the manual form of Spark's own runtime
  * row-level filtering, reusing the engine's Tungsten bloom machinery
  * (BloomFilterAggregate / BloomFilterMightContain) rather than
  * reimplementing a sketch.
  *
  * Scale story (the whole point of the operator): a 100 TB fact
  * semi-joined to a selective key set normally shuffles the ENTIRE fact
  * on the join key — including the overwhelming majority of rows that
  * match nothing. The bloom pass evaluates `might_contain` inside the
  * fact's scan stage (a scalar subquery computed once, broadcast with
  * the task binary), so non-matching rows die before the Exchange and
  * the shuffle carries only candidates plus the bloom's false-positive
  * rate. The trailing exact semi join removes those false positives:
  * the operator's CONTRACT is bit-equality with a plain left_semi join,
  * which is exactly what the oracle checks.
  */
object BloomJoin {

  private def bloomAgg(key: Column, items: Long, bits: Long): Column =
    GraftBridge.column(new BloomFilterAggregate(
      GraftBridge.expression(key),
      GraftBridge.expression(lit(items)),
      GraftBridge.expression(lit(bits))).toAggregateExpression())

  private def mightContain(bloom: Column, key: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      GraftBridge.expression(bloom), GraftBridge.expression(key)))

  /** Exact left-semi join of `large` against `small`'s `key` set, with
    * a bloom prefilter evaluated in `large`'s scan stage. Result is
    * identical to `large.join(small, key, "left_semi")` for ANY bloom
    * sizing — the parameters trade shuffle volume, never correctness.
    */
  def semiJoin(large: DataFrame, small: DataFrame, key: String,
      estimatedItems: Long = 1000000L, numBits: Long = 1L << 23): DataFrame = {
    val bloom = GraftBridge.scalarSubquery(
      small.agg(bloomAgg(col(key), estimatedItems, numBits).as("bloom")))
    large
      .filter(mightContain(bloom, col(key)))
      // left_semi ignores duplicate build rows by construction — no
      // pre-distinct needed (it would just add a shuffle).
      .join(small.select(col(key)), Seq(key), "left_semi")
  }
}
