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

  test("NaN and NULL scores are excluded inside the aggregate (degenerate-score contract)") {
    // The exclusion lives in TopKByScore.update, not in a Filter above
    // the aggregate: a pushed pre-filter on the score column would
    // re-evaluate the scoring expression once for the filter and again
    // for the aggregate (the round-9 q160 2.5x regression). A NaN would
    // otherwise rank FIRST (Spark's double ordering places NaN
    // greatest); instead it never enters a buffer, and a group with
    // fewer than k rankable candidates returns fewer rows.
    val df = Seq(
      (1L, Double.NaN, 10L), (1L, 5.0, 11L), (1L, Double.NaN, 12L), (1L, 7.0, 13L),
      (2L, Double.NaN, 20L))
      .toDF("g", "score", "id")
    val viaAgg = df.groupBy("g")
      .agg(Sketch.topKByScore($"score", $"id", 3).as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", $"col.id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    assert(viaAgg(1L) == Seq(13L, 11L)) // NaN rows 10/12 excluded; 7.0 > 5.0
    assert(!viaAgg.contains(2L) || viaAgg(2L).isEmpty) // all-NaN group ranks nothing
  }

  test("topk state merges across streaming micro-batches == one-shot batch") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, Double, Long)]
    val q = mem.toDF().toDF("g", "score", "id")
      .groupBy("g").agg(Sketch.topKByScore($"score", $"id", 3).as("top"))
      .writeStream.format("memory").queryName("topk_stream").outputMode("complete").start()
    try {
      val all = (1L to 200L).map(i => (i % 2, (i * 31 % 100).toDouble, i))
      mem.addData(all.take(120): _*)
      q.processAllAvailable()
      mem.addData(all.drop(120): _*)
      q.processAllAvailable()
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select($"g", $"top").collect()
          .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getDouble(0), x.getLong(1))))
          .toMap
      val streamed = canon(spark.table("topk_stream"))
      val batch = canon(all.toDF("g", "score", "id").groupBy("g")
        .agg(Sketch.topKByScore($"score", $"id", 3).as("top")))
      assert(streamed == batch)
    } finally q.stop()
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
