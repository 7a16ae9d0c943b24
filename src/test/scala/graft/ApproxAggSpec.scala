package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WarehouseAggregates

class ApproxAggSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  test("approx hourly aggregate tracks the exact one on a dense group") {
    // one hour, one device_type, 10k evenly spread values — dense enough
    // that the sketch (accuracy 10000) must land within a few ranks
    val base = 1704067200000L
    val rows = (0 until 10000).map { i =>
      (new Timestamp(base + (i % 3600) * 1000L), i.toLong, "temperature",
        i.toDouble, 95, false, 0L)
    }
    val r = rows.toDF("time", "device_id", "device_type", "value",
      "quality_score", "is_anomaly", "event_id")

    val exact = WarehouseAggregates.hourlyAgg(r)
      .select("median_value", "p95_value").head
    val approx = WarehouseAggregates.hourlyAggApprox(r)
      .select("median_value", "p95_value").head

    assert(math.abs(exact.getDouble(0) - approx.getDouble(0)) <= 5.0)
    assert(math.abs(exact.getDouble(1) - approx.getDouble(1)) <= 5.0)
    // sketch result is an actual sample, bounded by the data range
    assert(approx.getDouble(0) >= 0.0 && approx.getDouble(0) <= 9999.0)
  }

  test("histogram quantile sketch accumulates across streaming micro-batches") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Robust
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val q = Robust.histBinCounts(mem.toDF().toDF("g", "v"), "g", "v")
      .writeStream.format("memory").queryName("hist_stream").outputMode("complete").start()
    try {
      val batch1 = (1 to 400).map(i => ("g", (i % 590).toDouble))
      val batch2 = (1 to 300).map(i => ("g", ((i * 7) % 590).toDouble))
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      val streamed = Robust.estimateFromBins(spark.table("hist_stream"), "g")
        .head().toSeq
      val batch = Robust.histQuantile((batch1 ++ batch2).toDF("g", "v"), "g", "v")
        .head().toSeq
      assert(streamed == batch) // stream-accumulated sketch == one-shot batch
    } finally q.stop()
  }

  test("log quantile sketch accumulates across streaming micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Robust
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val q = Robust.logBinCounts(mem.toDF().toDF("g", "v"), "g", "v")
      .writeStream.format("memory").queryName("logq_stream").outputMode("complete").start()
    try {
      // magnitudes 1 .. ~1e9 across two batches
      val batch1 = (1 to 400).map(i => ("g", 1L + (i.toLong * i * i) % 1000000000L))
      val batch2 = (1 to 300).map(i => ("g", 1L + (i.toLong * 7919) % 100000L))
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      val streamed = Robust.logEstimateFromBins(spark.table("logq_stream"), "g",
        Seq(0.5, 0.9, 0.99)).head().toSeq
      val batch = Robust.logQuantile((batch1 ++ batch2).toDF("g", "v"), "g", "v")
        .head().toSeq
      assert(streamed == batch) // stream-accumulated sketch == one-shot batch
    } finally q.stop()
  }

  test("histogram quantile ignores NULL values like exact percentile does") {
    import org.apache.spark.sql.functions._
    import graft.operators.Robust
    val width = (Robust.HistHi - Robust.HistLo) / Robust.HistBins
    // 100 values near 500 plus 100 NULLs: NULLs must not drag p50 to bin 0
    val rows = (1 to 100).map(i => ("g", Some(500.0 + (i % 5) / 10.0))) ++
      (1 to 100).map(_ => ("g", Option.empty[Double]))
    val df = rows.toDF("g", "v")
    val est = Robust.histQuantile(df, "g", "v").head()
    val exact = df.agg(percentile(col("v"), lit(0.5))).head.getDouble(0)
    assert(est.getLong(1) == 100L) // n counts only non-null values
    assert(math.abs(est.getDouble(2) - exact) <= width, s"p50 ${est.getDouble(2)} vs $exact")
  }

  test("histogram quantile estimate is partitioning-invariant and within one bin width") {
    import org.apache.spark.sql.functions._
    import graft.operators.Robust
    val width = (Robust.HistHi - Robust.HistLo) / Robust.HistBins
    // deterministic non-uniform values in [0, 600)
    val rows = (0 until 8000).map(i => ("g" + (i % 2), (i * i % 5997) / 10.0))
    val df = rows.toDF("g", "v")
    val a = Robust.histQuantile(df.repartition(1), "g", "v").orderBy("g").collect()
    val b = Robust.histQuantile(df.repartition(13), "g", "v").orderBy("g").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq) // merge path bit-identical
    val exact = df.groupBy("g")
      .agg(percentile(col("v"), lit(0.5)).as("e50"), percentile(col("v"), lit(0.95)).as("e95"))
      .orderBy("g").collect()
    a.zip(exact).foreach { case (est, ex) =>
      assert(math.abs(est.getDouble(2) - ex.getDouble(1)) <= width, s"p50 off: $est vs $ex")
      assert(math.abs(est.getDouble(3) - ex.getDouble(2)) <= width, s"p95 off: $est vs $ex")
    }
  }
}
