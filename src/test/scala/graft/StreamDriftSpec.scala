package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.model.SensorEvent
import graft.streaming.StreamDrift

/** mapGroupsWithState EWMA drift monitor: streaming state across
  * micro-batches must equal the one-pass batch fold, and drifted
  * readings must be counted once history is established.
  */
class StreamDriftSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  private def ev(sec: Long, dev: String, v: Double) =
    SensorEvent(new Timestamp(1704067200000L + sec * 1000), dev, "t", v, "C", 95, false, "{}")

  test("streaming EWMA state across micro-batches equals the one-pass batch fold") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[SensorEvent]
    val q = StreamDrift.detectStream(mem.toDS())
      .writeStream.format("memory").queryName("drift").outputMode("update")
      .start()

    val batch1 = Seq(ev(0, "d1", 20.0), ev(10, "d1", 22.0), ev(20, "d1", 21.0),
      ev(5, "d2", 5.0))
    val batch2 = Seq(ev(30, "d1", 19.0), ev(40, "d1", 90.0), // spike → drift
      ev(50, "d1", 21.0), ev(35, "d2", 6.0))
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    // update mode re-emits per batch: the LAST row per device is the
    // current state
    val got = spark.table("drift").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getLong(3))))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }
    val expected = StreamDrift.detectBatch(batch1 ++ batch2)
    assert(got("d1") == ((expected("d1").n_events, expected("d1").ewma, expected("d1").n_drift)))
    assert(got("d2") == ((expected("d2").n_events, expected("d2").ewma, expected("d2").n_drift)))
    // the 90.0 spike against a ~21 EWMA with 4 readings of history drifts
    assert(got("d1")._3 == 1L)
    // d2 never accumulates minHistory → no drift possible
    assert(got("d2")._3 == 0L)
  }

  test("distributed backfill twin equals the driver fold across many partitions") {
    // 40 devices x 25 readings shuffled across 8 partitions: the
    // sort-within-partitions single-pass fold must agree with the
    // driver-side reference fold device-for-device (including a spiky
    // device with several drifts)
    val rng = new scala.util.Random(7)
    val events = (for {
      d <- 1 to 40; i <- 1 to 25
    } yield ev(i * 60L + d, s"dev$d", if (rng.nextDouble() < 0.1) 200.0 else 20.0 + d))
    val shuffled = rng.shuffle(events)
    val got = StreamDrift.detectBatchDs(shuffled.toDS().repartition(8)).collect()
      .map(r => r.device_id -> ((r.n_events, r.ewma, r.n_drift))).toMap
    val expected = StreamDrift.detectBatch(shuffled)
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, e) =>
      assert(got(id) == ((e.n_events, e.ewma, e.n_drift)), s"device $id")
    }
    assert(expected.values.map(_.n_drift).sum > 0) // the fixture actually drifts
  }
}
