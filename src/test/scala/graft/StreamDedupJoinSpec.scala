package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.model.SensorEvent
import graft.streaming.StreamDedupJoin

class StreamDedupJoinSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  private def ev(sec: Long, dev: String, v: Double) =
    SensorEvent(new Timestamp(1704067200000L + sec * 1000), dev, "temperature", v,
      "C", 95, false, """{"k":"1"}""")

  test("streaming dedup drops re-deliveries across micro-batches") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[SensorEvent]
    val q = StreamDedupJoin
      .dedupWithinWatermark(mem.toDF(), "time", "10 minutes", Seq("device_id", "time"))
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      mem.addData(ev(0, "d1", 1.0), ev(60, "d1", 2.0), ev(0, "d1", 1.0)) // in-batch dup
      q.processAllAvailable()
      mem.addData(ev(0, "d1", 1.0), ev(120, "d2", 3.0)) // cross-batch re-delivery
      q.processAllAvailable()
      val rows = spark.table("dedup_out").collect()
      assert(rows.length == 3) // d1@0, d1@60, d2@120 — the re-deliveries are gone
    } finally q.stop()
  }

  test("stream-stream interval join matches within the lookback only") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[SensorEvent]
    val purchases = MemoryStream[SensorEvent]
    val joined = StreamDedupJoin.intervalJoin(
      purchases.toDF().select($"time", $"device_id", $"value"),
      clicks.toDF().select($"time", $"device_id", $"value"),
      "device_id", "time", lookbackSec = 300, delay = "10 minutes")
    val q = joined
      .select($"device_id", $"value".as("purchase_value"), $"r_value".as("click_value"))
      .writeStream.format("memory").queryName("ij_out").outputMode("append").start()
    try {
      clicks.addData(ev(0, "d1", 10.0), ev(500, "d1", 20.0), ev(100, "d2", 30.0))
      purchases.addData(ev(290, "d1", 1.0), ev(600, "d1", 2.0))
      q.processAllAvailable()
      val rows = spark.table("ij_out").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
      // purchase@290 sees click@0 (290s back, <=300); purchase@600 sees
      // click@500 (100s back) but NOT click@0 (600s back); d2's click
      // never joins — different key.
      assert(rows == Set(("d1", 1.0, 10.0), ("d1", 2.0, 20.0)))
    } finally q.stop()
  }

  test("dedup state is EVICTED as the watermark advances (bounded-state evidence)") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[SensorEvent]
    val q = StreamDedupJoin
      .dedupWithinWatermark(mem.toDF(), "time", "1 minute", Seq("device_id", "time"))
      .writeStream.format("memory").queryName("dedup_state").outputMode("append").start()
    try {
      def stateRows: Long = {
        val p = q.lastProgress
        if (p == null || p.stateOperators.isEmpty) -1L
        else p.stateOperators.map(_.numRowsTotal).sum
      }
      // batch 1: 200 distinct keys near t=0 → ~200 state rows
      mem.addData((1 to 200).map(i => ev(i % 50, s"dev$i", i.toDouble)): _*)
      q.processAllAvailable()
      val afterLoad = stateRows
      assert(afterLoad >= 200, s"expected the keys in state, got $afterLoad")
      // batch 2: jump event time far ahead → watermark passes the old
      // keys; one more batch for the eviction pass to run
      mem.addData(ev(100000, "late-driver", 0.0))
      q.processAllAvailable()
      mem.addData(ev(100060, "late-driver-2", 0.0))
      q.processAllAvailable()
      val afterEvict = stateRows
      assert(afterEvict >= 0 && afterEvict < 50,
        s"state not evicted: $afterLoad -> $afterEvict rows")
    } finally q.stop()
  }

  test("stream-static enrichment joins the broadcast dim, keeps unmatched rows") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[SensorEvent]
    val dim = Seq(("d1", "factory-a"), ("d2", "factory-b"))
      .toDF("device_id", "site")
    val q = graft.streaming.StreamPipeline
      .enrichWithDim(mem.toDF().select($"time", $"device_id", $"value"), dim, "device_id")
      .writeStream.format("memory").queryName("enrich_out").outputMode("append").start()
    try {
      mem.addData(ev(0, "d1", 1.0), ev(1, "d9", 2.0)) // d9 has no dim row
      q.processAllAvailable()
      val rows = spark.table("enrich_out")
        .select($"device_id", $"site").collect()
        .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
      assert(rows == Map("d1" -> Some("factory-a"), "d9" -> None))
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched rows with nulls after the watermark") {
    implicit val ctx = spark.sqlContext
    val purchases = MemoryStream[SensorEvent]
    val clicks = MemoryStream[SensorEvent]
    val joined = StreamDedupJoin.intervalJoinLeftOuter(
      purchases.toDF().select($"time", $"device_id", $"value"),
      clicks.toDF().select($"time", $"device_id", $"value"),
      "device_id", "time", lookbackSec = 300, delay = "1 minute")
    val q = joined
      .select($"device_id", $"value".as("purchase_value"), $"r_value".as("click_value"))
      .writeStream.format("memory").queryName("loj_out").outputMode("append").start()
    try {
      clicks.addData(ev(0, "d1", 10.0))
      purchases.addData(ev(100, "d1", 1.0), ev(100, "d2", 2.0)) // d2 has no click
      q.processAllAvailable()
      // the matched row may emit now; the unmatched d2 row CANNOT emit
      // until the watermark proves no d2 click can still arrive
      val early = spark.table("loj_out").collect()
      assert(!early.exists(r => r.getString(0) == "d2"))
      // advance both watermarks far past d2@100's join window
      clicks.addData(ev(5000, "dx", 0.0))
      purchases.addData(ev(5000, "dx", 0.0))
      q.processAllAvailable()
      // one more batch so the state-store eviction pass runs
      clicks.addData(ev(5100, "dx", 0.0))
      purchases.addData(ev(5100, "dx", 0.0))
      q.processAllAvailable()
      val rows = spark.table("loj_out")
        .select($"device_id", $"purchase_value", $"click_value").collect()
        .map(r => (r.getString(0), r.getDouble(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      assert(rows.contains(("d1", 1.0, Some(10.0))))
      assert(rows.contains(("d2", 2.0, None))) // null-matched after expiry
    } finally q.stop()
  }
}
