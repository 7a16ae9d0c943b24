package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.model.SensorEvent
import graft.streaming.StreamCusum

/** mapGroupsWithState CUSUM change monitor: streaming state across
  * micro-batches must equal the one-pass batch fold; a persistent small
  * mean shift must alarm (the case EWMA band-alarms miss); the side
  * that signals must reset.
  */
class StreamCusumSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  private def ev(sec: Long, dev: String, v: Double) =
    SensorEvent(new Timestamp(1704067200000L + sec * 1000), dev, "t", v, "C", 95, false, "{}")

  test("streaming CUSUM state across micro-batches equals the one-pass batch fold") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[SensorEvent]
    // tight monitor so the small fixture can alarm: warmup 3, slack 2, h 10
    val q = StreamCusum.detectStream(mem.toDS(), warmup = 3L, slack = 2.0, h = 10.0)
      .writeStream.format("memory").queryName("cusum").outputMode("update")
      .start()
    // d1: warmup at ~20, then a persistent +7 shift — each reading adds
    // ~5 after slack, crossing h=10 within 3 readings, twice over
    val batch1 = Seq(ev(0, "d1", 20.0), ev(10, "d1", 21.0), ev(20, "d1", 19.0),
      ev(5, "d2", 5.0), ev(15, "d2", 5.0), ev(25, "d2", 5.0))
    val batch2 = Seq(ev(30, "d1", 27.0), ev(40, "d1", 27.0), ev(50, "d1", 27.0),
      ev(60, "d1", 27.0), ev(70, "d1", 27.0), ev(80, "d1", 27.0),
      ev(35, "d2", 5.0))
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("cusum").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5))))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }
    val expected = StreamCusum.detectBatch(batch1 ++ batch2,
      warmup = 3L, slack = 2.0, h = 10.0)
    for (d <- Seq("d1", "d2"))
      assert(got(d) == ((expected(d).n_events, expected(d).mu0, expected(d).sp,
        expected(d).sn, expected(d).n_alarms)), s"device $d")
    // the +7 persistent shift alarms (a 30-unit EWMA band never would)
    assert(got("d1")._5 >= 1L)
    // an alarm resets its side: the running S+ is below h again
    assert(got("d1")._3 <= 10.0)
    // d2 is flat: no alarms, both sides at 0
    assert(got("d2")._5 == 0L && got("d2")._3 == 0.0 && got("d2")._4 == 0.0)
  }

  test("distributed backfill twin equals the driver fold across many partitions") {
    val rng = new scala.util.Random(11)
    val events = (for {
      d <- 1 to 30; i <- 1 to 30
    } yield ev(i * 60L + d, s"dev$d",
      // devices ≡ 0 mod 3 shift +150 halfway — a sustained change
      if (d % 3 == 0 && i > 15) 300.0 + rng.nextInt(10) else 150.0 + rng.nextInt(10)))
    val shuffled = rng.shuffle(events)
    val got = StreamCusum.detectBatchDs(shuffled.toDS().repartition(8)).collect()
      .map(r => r.device_id -> ((r.n_events, r.mu0, r.sp, r.sn, r.n_alarms))).toMap
    val expected = StreamCusum.detectBatch(shuffled)
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, e) =>
      assert(got(id) == ((e.n_events, e.mu0, e.sp, e.sn, e.n_alarms)), s"device $id")
    }
    // every shifted device alarms at least once; unshifted never do
    expected.foreach { case (id, e) =>
      val d = id.stripPrefix("dev").toInt
      if (d % 3 == 0) assert(e.n_alarms >= 1L, s"$id should alarm")
      else assert(e.n_alarms == 0L, s"$id should stay quiet")
    }
  }
}
