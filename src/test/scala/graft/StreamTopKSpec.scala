package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.SensorEvent
import graft.streaming._

/** Stream ≡ batch proof for the windowed top-k leaderboard: the
  * mergeable TopKByScore heap accumulates across micro-batches in the
  * state store, and a late in-watermark event that DISPLACES a current
  * leader re-emits its window with the heap re-elected — the update the
  * upsert sink must replace in place.
  */
class StreamTopKSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  private def ev(sec: Long, dev: String, v: Double, seq: Long) =
    SensorEvent(new Timestamp(1704067200000L + sec * 1000), dev, "temperature", v,
      "C", 95, false, s"""{"seq":"$seq"}""")

  private def withId(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("eid", get_json_object(col("metadata"), "$.seq").cast("long"))

  test("streaming windowed top-k equals batch, late displacement included") {
    val dir = Files.createTempDirectory("graft-topk").toString
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[SensorEvent]

    val agg = StreamAggregates.windowedTopK(withId(mem.toDF()), "eid", k = 2)
    val q = StreamSinks.parquetUpsert(
      agg, s"$dir/agg", Seq("window_start", "device_type"),
      s"$dir/ckpt", "1 seconds").start()

    // window 0: leaders 30 (seq 3) and 20 (seq 2); window 1: one event
    val batch1 = Seq(
      ev(0, "d1", 10.0, 1), ev(10, "d1", 20.0, 2), ev(20, "d2", 30.0, 3),
      ev(70, "d1", 5.0, 4))
    mem.addData(batch1: _*)
    q.processAllAvailable()

    // late event into window 0 with a HIGHER value: displaces seq 1/2
    // from the k=2 leaderboard — the window must re-emit re-elected
    val late = ev(45, "d2", 25.0, 5)
    mem.addData(late)
    q.processAllAvailable()
    q.stop()

    val streamed = StreamSinks.readStore(spark, s"$dir/agg")
    val expected = StreamAggregates.windowedTopK(
      withId((batch1 :+ late).toDF()), "eid", k = 2)

    def flat(df: org.apache.spark.sql.DataFrame) = df
      .select(col("window_start"), col("device_type"),
        posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("window_start"), col("device_type"), col("pos"),
        col("t.score"), col("t.id"))
      .orderBy("window_start", "device_type", "pos")
      .collect().map(_.toSeq).toSeq
    assert(flat(streamed) == flat(expected))
    // the late 25.0 made the window-0 board (30, 25) — seq 2's 20 is out
    val w0 = flat(streamed).filter(r =>
      r.head == new Timestamp(1704067200000L) && r(1) == "temperature")
    assert(w0.map(r => (r(3), r(4))) == Seq((30.0, 3L), (25.0, 5L)))
  }
}
