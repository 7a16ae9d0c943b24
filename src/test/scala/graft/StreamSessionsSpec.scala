package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.model.SensorEvent
import graft.streaming.StreamSessions

class StreamSessionsSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  private def ev(sec: Long, dev: String, v: Double) =
    SensorEvent(new Timestamp(1704067200000L + sec * 1000), dev, "t", v, "C", 95, false, "{}")

  test("flatMapGroupsWithState sessionization: gap close, timeout close, bounded state") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[SensorEvent]
    val q = StreamSessions
      .sessionizeStream(mem.toDS(), gapSeconds = 60, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("closed_sessions").outputMode("append")
      .start()

    // d1: two events 30s apart (one session); d2: one lone event
    mem.addData(ev(0, "d1", 1.0), ev(30, "d1", 2.0), ev(50, "d2", 9.0))
    q.processAllAvailable()
    // d1 again far later: closes d1's first session inline (gap exceeded)
    // and advances the watermark past d2's timeout
    mem.addData(ev(1000, "d1", 3.0))
    q.processAllAvailable()
    // one more batch so the timeout for d2 (armed before the watermark
    // advanced) actually fires
    mem.addData(ev(2000, "d3", 4.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("closed_sessions")
      .select("device_id", "n_events", "sum_value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows.contains(("d1", 2L, 3.0))) // gap-closed session (events at 0s and 30s)
    assert(rows.contains(("d2", 1L, 9.0))) // timeout-closed session
  }
}
