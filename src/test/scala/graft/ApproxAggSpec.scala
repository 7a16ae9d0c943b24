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
}
