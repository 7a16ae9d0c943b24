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

  test("batch backfill twin emits the same sessions as the fully-drained stream") {
    implicit val ctx = spark.sqlContext
    val events = Seq(
      ev(0, "d1", 1.0), ev(30, "d1", 2.0), // session 1
      ev(200, "d1", 3.0), ev(230, "d1", 4.0), ev(250, "d1", 5.0), // session 2
      ev(50, "d2", 9.0), // lone session
      ev(500, "d3", 1.5), ev(620, "d3", 2.5)) // gap 120 > 60 → two sessions
    val got = StreamSessions.sessionizeBatch(spark.createDataset(events).repartition(4), 60)
      .collect()
      .map(s => (s.device_id, s.session_start.getTime, s.session_end.getTime,
        s.n_events, s.sum_value)).toSet
    val t0 = 1704067200000L
    assert(got == Set(
      ("d1", t0, t0 + 30000L, 2L, 3.0),
      ("d1", t0 + 200000L, t0 + 250000L, 3L, 12.0),
      ("d2", t0 + 50000L, t0 + 50000L, 1L, 9.0),
      ("d3", t0 + 500000L, t0 + 500000L, 1L, 1.5),
      ("d3", t0 + 620000L, t0 + 620000L, 1L, 2.5)))
    // and the stream, fully drained past every timeout, closes the same set
    val mem = MemoryStream[SensorEvent]
    val q = StreamSessions
      .sessionizeStream(mem.toDS(), gapSeconds = 60, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("batch_twin_sessions").outputMode("append")
      .start()
    mem.addData(events.sortBy(_.time.getTime): _*)
    q.processAllAvailable()
    mem.addData(ev(10000, "flush", 0.0)) // advance watermark far past all gaps
    q.processAllAvailable()
    mem.addData(ev(20000, "flush2", 0.0)) // let armed timeouts fire
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("batch_twin_sessions")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime,
        r.getLong(3), r.getDouble(4)))
      .filterNot(_._1.startsWith("flush")).toSet
    assert(streamed == got)
  }
}
