package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.model.SensorEvent
import graft.streaming._

class StreamingSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  private def ev(sec: Long, dev: String, v: Double, anomaly: Boolean = false) =
    SensorEvent(new Timestamp(1704067200000L + sec * 1000), dev, "temperature", v,
      "C", 95, anomaly, """{"k":"1"}""")

  test("streaming 1-min windows with upsert sink equal the batch computation") {
    val dir = Files.createTempDirectory("graft-stream").toString
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[SensorEvent]

    val agg = StreamAggregates.windowedAggregates(
      StreamTransforms.withProcessingMeta(mem.toDF()))
    val q = StreamSinks.parquetUpsert(
      agg.drop("avg_latency_seconds"), // wall-clock dependent — excluded from equality
      s"$dir/agg", Seq("window_start", "device_id", "device_type"),
      s"$dir/ckpt", "1 seconds").start()

    val batch1 = Seq(ev(0, "d1", 10.0), ev(30, "d1", 20.0), ev(70, "d1", 30.0), ev(10, "d2", 5.0, anomaly = true))
    mem.addData(batch1: _*)
    q.processAllAvailable()

    // late event into the FIRST window (within watermark) → window re-emitted,
    // upsert must replace, not duplicate, the (window,d1) row
    val late = ev(45, "d1", 40.0)
    mem.addData(late)
    q.processAllAvailable()
    q.stop()

    val streamed = StreamSinks.readStore(spark, s"$dir/agg")
    val expected = StreamAggregates.windowedAggregates(
      StreamTransforms.withProcessingMeta((batch1 :+ late).toDF()))
      .drop("avg_latency_seconds")

    val cols = expected.columns.sorted.toSeq
    val s = streamed.select(cols.head, cols.tail: _*).orderBy("window_start", "device_id").collect().toSeq
    val e = expected.select(cols.head, cols.tail: _*).orderBy("window_start", "device_id").collect().toSeq
    assert(s.map(_.toSeq) == e.map(_.toSeq))
    // the late-updated window really reflects 3 readings
    val d1w0 = streamed.filter($"device_id" === "d1" && $"window_start" === new Timestamp(1704067200000L))
      .select("reading_count", "avg_value").head
    assert(d1w0.getLong(0) == 3L)
  }

  test("watermark bounds state: data later than the delay is dropped") {
    val dir = Files.createTempDirectory("graft-wm").toString
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[SensorEvent]
    val agg = StreamAggregates.windowedAggregates(
      StreamTransforms.withProcessingMeta(mem.toDF()), watermark = Some("10 minutes"))
    val q = StreamSinks.parquetUpsert(agg.drop("avg_latency_seconds"),
      s"$dir/agg", Seq("window_start", "device_id", "device_type"), s"$dir/ckpt", "1 seconds").start()

    mem.addData(ev(3600, "d1", 1.0)) // advances watermark to t=3600s-10min
    q.processAllAvailable()
    mem.addData(ev(300, "d1", 99.0)) // 45 min late — beyond the watermark
    q.processAllAvailable()
    q.stop()

    val windows = StreamSinks.readStore(spark, s"$dir/agg")
      .select("window_start").collect().map(_.getTimestamp(0).getTime).toSet
    assert(windows == Set(1704067200000L + 3600 * 1000)) // only the on-time window
  }

  test("kafka json parse flattens the 8-field sensor schema") {
    val json =
      """{"time":"2024-01-01T00:00:30+00:00","device_id":"TEMP-001","device_type":"temperature",
        |"value":22.5,"unit":"C","quality_score":97,"is_anomaly":false,
        |"metadata":"{\"simulator_version\":\"1.0\"}"}""".stripMargin.replace("\n", "")
    val kafkaish = Seq((json, new Timestamp(1704067230000L))).toDF("value", "timestamp")
    val parsed = KafkaJsonSource.parseJson(kafkaish)
    val r = parsed.select("time", "device_id", "value", "quality_score", "is_anomaly").head
    assert(r.getTimestamp(0) == new Timestamp(1704067200000L + 30000))
    assert(r.getString(1) == "TEMP-001" && r.getDouble(2) == 22.5)
    assert(r.getInt(3) == 97 && !r.getBoolean(4))
  }

  test("upsertBatch: second batch wins on key collision, others survive") {
    val dir = Files.createTempDirectory("graft-upsert").toString + "/t"
    val keys = Seq("k")
    StreamSinks.upsertBatch(Seq((1, "a"), (2, "b")).toDF("k", "v"), dir, keys)
    StreamSinks.upsertBatch(Seq((2, "B"), (3, "c")).toDF("k", "v"), dir, keys)
    val r = StreamSinks.readStore(spark, dir).collect().map(x => x.getInt(0) -> x.getString(1)).toMap
    assert(r == Map(1 -> "a", 2 -> "B", 3 -> "c"))
  }
}
