package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.Sketch

class HllSketchSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  test("hll estimate lands within HLL error bounds of the exact count") {
    val df = (1 to 20000).map(i => s"user-$i").toDF("u")
    val est = df.agg(Sketch.hllMd5($"u")).head.getDouble(0)
    // m=512 → standard error 1.04/sqrt(512) ≈ 4.6%; allow 3 sigma
    assert(math.abs(est - 20000) / 20000 < 0.14, s"estimate $est")
  }

  test("estimate is bit-identical regardless of partitioning (merge path)") {
    val rows = (1 to 5000).map(i => s"k-${i % 1700}")
    val a = rows.toDF("u").repartition(1).agg(Sketch.hllMd5($"u")).head.getDouble(0)
    val b = rows.toDF("u").repartition(13).agg(Sketch.hllMd5($"u")).head.getDouble(0)
    assert(a == b)
    assert(math.abs(a - 1700) / 1700 < 0.14)
  }

  test("sketch aggregates across streaming micro-batches (mergeable state)") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[String]
    val q = mem.toDF().agg(Sketch.hllMd5(col("value")).as("est"))
      .writeStream.format("memory").queryName("hll_stream").outputMode("complete").start()
    try {
      mem.addData((1 to 1000).map(i => s"s$i"): _*)
      q.processAllAvailable()
      mem.addData((500 to 1500).map(i => s"s$i"): _*) // overlaps first batch
      q.processAllAvailable()
      val est = spark.table("hll_stream").head.getDouble(0)
      val batchEst = (1 to 1500).map(i => s"s$i").toDF("value")
        .agg(Sketch.hllMd5(col("value"))).head.getDouble(0)
      assert(est == batchEst) // stream state merge == one-shot batch
    } finally q.stop()
  }

  test("sketch is insensitive to duplication (distinct, not count)") {
    val once = (1 to 3000).map(i => s"d-$i")
    val a = once.toDF("u").agg(Sketch.hllMd5($"u")).head.getDouble(0)
    val b = (once ++ once ++ once).toDF("u").agg(Sketch.hllMd5($"u")).head.getDouble(0)
    assert(a == b)
  }
}
