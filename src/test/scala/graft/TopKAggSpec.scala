package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.Sketch

class TopKAggSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  test("topk aggregate equals the window idiom, across many partitions") {
    val df = (1L to 5000L).map(i => (i % 7, (i * 37 % 1000).toDouble, i))
      .toDF("g", "score", "id")
      .repartition(16) // force real partial/merge paths
    val viaAgg = df.groupBy("g")
      .agg(Sketch.topKByScore($"score", $"id", 5).as("top"))
      .select($"g", posexplode($"top").as(Seq("pos", "t")))
      .select($"g", $"t.score", $"t.id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sorted.toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(desc("score"), asc("id"))
    val viaWindow = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      .select($"g", $"score", $"id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sorted.toSeq
    assert(viaAgg == viaWindow)
    assert(viaAgg.size == 35) // 7 groups x 5
  }

  test("ties resolve by id ascending; groups smaller than k are complete") {
    val df = Seq((1L, 9.0, 30L), (1L, 9.0, 10L), (1L, 9.0, 20L), (2L, 1.0, 1L))
      .toDF("g", "score", "id")
    val r = df.groupBy("g").agg(Sketch.topKByScore($"score", $"id", 2).as("top"))
      .select($"g", $"top").collect()
      .map(x => x.getLong(0) -> x.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1))).toMap
    assert(r(1L) == Seq(10L, 20L)) // 30 evicted: same score, larger id
    assert(r(2L) == Seq(1L)) // under-full group returns what exists
  }

  test("the aggregate plans with map-side partial aggregation (no window sort)") {
    val df = (1L to 100L).map(i => (i % 3, i.toDouble, i)).toDF("g", "score", "id")
    val plan = df.groupBy("g")
      .agg(Sketch.topKByScore($"score", $"id", 3).as("top"))
      .queryExecution.executedPlan.toString
    // two-phase hash/objecthash aggregate, never a Window operator
    assert(plan.contains("partial_topk_by_score"), plan.take(1500))
    assert(!plan.contains("Window"), plan.take(1500))
  }
}
