package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.batch.BatchPipeline
import graft.functions.Vec
import graft.gen.IotSimulator
import graft.operators.SensorAdapter
import graft.sources.Tables

class PipelineSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  test("dotFast (codegen expression) is bit-identical to the fold dot") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val diff = df.select((Vec.dot($"a", $"b") - Vec.dotFast($"a", $"b")).as("d"))
      .agg(max(abs($"d"))).head.getDouble(0)
    assert(diff == 0.0)
  }

  test("simulator is deterministic, clamped, and profile-complete") {
    val start = new Timestamp(1704067200000L)
    val a = IotSimulator.generate(seed = 42, start, count = 500)
    val b = IotSimulator.generate(seed = 42, start, count = 500)
    assert(a == b)
    assert(a.map(_.device_id).toSet == IotSimulator.Devices.map(_.id).toSet)
    val hum = a.filter(_.device_type == "humidity").map(_.value)
    assert(hum.forall(v => v >= 0 && v <= 100))
    assert(a.filter(_.device_type == "motion").map(_.value).forall(v => v == 0.0 || v == 1.0))
    val anomalous = a.filter(_.is_anomaly)
    assert(anomalous.forall(e => e.quality_score >= 70 && e.quality_score <= 90))
  }

  test("batch pipeline end-to-end: transform, observe metrics, load partitioned fact") {
    val out = Files.createTempDirectory("graft-batch").toString
    val readings = SensorAdapter.fromEvents(Tables(spark, "/root/testdata/sf0.001", "events"))
    val metrics = new BatchPipeline(out).run(readings)
    assert(metrics("n_total") == 1000L)
    assert(metrics("n_invalid") == 0L)
    val fact = spark.read.parquet(s"$out/fact_sensor_readings_enriched")
    assert(fact.count() == 1000L)
    assert(fact.columns.contains("date")) // partition column survives
    assert(fact.columns.contains("rolling_avg_5min") && fact.columns.contains("is_anomaly_combined"))
    // partition pruning works on the layout
    val pruned = fact.filter(col("date") === "2024-01-15")
    assert(pruned.count() > 0)
  }
}
