package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.BloomJoin

class BloomJoinSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  test("bloom semi join equals plain left_semi for any sizing") {
    val large = (1L to 1000L).map(i => (i % 97, i)).toDF("k", "v")
    val small = Seq(3L, 11L, 96L, 500L).toDF("k") // 500 matches nothing
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val exact = canon(large.join(small, Seq("k"), "left_semi"))
    // tiny bloom (high FP rate) AND roomy bloom must both be exact
    assert(canon(BloomJoin.semiJoin(large, small, "k", 10L, 64L)) == exact)
    assert(canon(BloomJoin.semiJoin(large, small, "k", 1000L, 1L << 20)) == exact)
    assert(exact.nonEmpty)
  }

  test("the bloom prefilter evaluates before the exact join in the plan") {
    val large = (1L to 100L).map(i => (i, i)).toDF("k", "v")
    val small = Seq(1L, 2L).toDF("k")
    val plan = BloomJoin.semiJoin(large, small, "k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(1500))
  }
}
