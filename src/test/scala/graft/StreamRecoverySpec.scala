package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.streaming.{StreamAggregates, StreamMetrics, StreamSinks, StreamTransforms}

/** Proves the checkpoint-recovery contract (SURVEY §2.9 T5/T8): a
  * streaming query killed and restarted from the same checkpoint
  * resumes without reprocessing or double-counting, and the upsert sink
  * stays correct across the restart — the property the reference
  * aspires to with acks=all + checkpointing but never tests.
  */
class StreamRecoverySpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  private def ev(sec: Long, dev: String, v: Double) =
    graft.model.SensorEvent(new Timestamp(1704067200000L + sec * 1000), dev, "temperature",
      v, "C", 95, false, """{"k":"1"}""")

  private def writeBatch(dir: String, name: String, rows: Seq[graft.model.SensorEvent]): Unit =
    rows.toDF().write.mode("overwrite").parquet(s"$dir/in/$name")

  test("restart from checkpoint: no double counting, upsert stays correct") {
    val dir = Files.createTempDirectory("graft-recover").toString
    Files.createDirectories(Paths.get(s"$dir/in"))
    writeBatch(dir, "b1", Seq(ev(0, "d1", 10.0), ev(30, "d1", 20.0)))

    def startQuery() = {
      val src = spark.readStream
        .schema(org.apache.spark.sql.Encoders.product[graft.model.SensorEvent].schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$dir/in/*")
      val agg = StreamAggregates.windowedAggregates(
        StreamTransforms.withProcessingMeta(src)).drop("avg_latency_seconds")
      StreamSinks.parquetUpsert(agg, s"$dir/agg",
        Seq("window_start", "device_id", "device_type"), s"$dir/ckpt", "1 seconds")
        .queryName("recover_agg").start()
    }

    val metrics = StreamMetrics.attach(spark)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop() // simulated crash/redeploy

    val afterFirst = StreamSinks.readStore(spark, s"$dir/agg")
      .filter($"device_id" === "d1").select("reading_count").head.getLong(0)
    assert(afterFirst == 2L)

    // new data lands while the query is down
    writeBatch(dir, "b2", Seq(ev(45, "d1", 30.0), ev(50, "d2", 1.0)))

    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    StreamMetrics.detach(spark, metrics)

    val store = StreamSinks.readStore(spark, s"$dir/agg")
    val d1 = store.filter($"device_id" === "d1").select("reading_count", "avg_value").head
    // 3 readings total for d1, not 5 — b1 was NOT reprocessed into the agg
    assert(d1.getLong(0) == 3L)
    assert(d1.getDouble(1) == 20.0)
    assert(store.filter($"device_id" === "d2").count() == 1L)

    // the listener saw real progress with input rows (listener events
    // are delivered async on the bus — poll briefly instead of racing)
    val deadline = System.currentTimeMillis() + 10000
    def ok = metrics.snapshot("recover_agg").exists(s => s.totalInputRows >= 4L && s.batches >= 2L)
    while (!ok && System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(ok, metrics.snapshots.toString)
  }

  test("live partitioned-upsert stream: restart updates only the late window") {
    import java.security.MessageDigest
    val dir = Files.createTempDirectory("graft-live-part").toString
    Files.createDirectories(Paths.get(s"$dir/in"))
    // two distinct 1-minute windows in the first batch
    writeBatch(dir, "b1", Seq(ev(0, "d1", 10.0), ev(70, "d1", 20.0)))

    def startQuery() = {
      val src = spark.readStream
        .schema(org.apache.spark.sql.Encoders.product[graft.model.SensorEvent].schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$dir/in/*")
      val agg = StreamAggregates.windowedAggregates(
        StreamTransforms.withProcessingMeta(src)).drop("avg_latency_seconds")
      StreamSinks.parquetUpsert(agg, s"$dir/agg",
        Seq("window_start", "device_id", "device_type"), s"$dir/ckpt", "1 seconds",
        partitionCol = Some("window_start"))
        .queryName("live_part").start()
    }

    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    val partDirs = Files.list(Paths.get(s"$dir/agg")).toArray.map(_.toString)
      .filter(_.contains("p=")).sorted
    assert(partDirs.length == 2, partDirs.mkString(","))
    def state(p: String): Seq[(String, Long, String)] = {
      val s = Files.walk(Paths.get(p))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(Files.isRegularFile(_)).map { f =>
          val md5 = MessageDigest.getInstance("MD5").digest(Files.readAllBytes(f))
            .map("%02x".format(_)).mkString
          (f.toString, Files.getLastModifiedTime(f).toMillis, md5)
        }.toSeq.sortBy(_._1)
      } finally s.close()
    }
    val w1Before = state(partDirs.head)

    // late data for the SECOND window only, while the query is down
    writeBatch(dir, "b2", Seq(ev(80, "d1", 40.0)))
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

    assert(state(partDirs.head) == w1Before) // first window never rewritten
    val store = StreamSinks.readStore(spark, s"$dir/agg")
      .select("window_start", "reading_count", "avg_value").collect()
      .map(r => r.getTimestamp(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(store.size == 2)
    assert(store.values.toSet == Set((1L, 10.0), (2L, 30.0))) // w2 merged late row
  }

  test("partitioned upsert rejects a partition column outside the merge keys") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      StreamSinks.upsertBatchPartitioned(
        Seq((1L, "d1", 1.0)).toDF("w", "device_id", "v"),
        Files.createTempDirectory("graft-badpart").toString, Seq("device_id"), "w")
    }
  }

  test("partitioned upsert leaves untouched partitions byte-identical") {
    import java.security.MessageDigest
    val dir = Files.createTempDirectory("graft-part-upsert").toString + "/store"
    val w1 = new Timestamp(1704067200000L) // window A
    val w2 = new Timestamp(1704067260000L) // window B

    def fileState(p: String): Map[String, (Long, String)] = {
      val root = Paths.get(p)
      val s = Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(Files.isRegularFile(_)).map { f =>
          val md5 = MessageDigest.getInstance("MD5").digest(Files.readAllBytes(f))
            .map("%02x".format(_)).mkString
          f.toString -> ((Files.getLastModifiedTime(f).toMillis, md5))
        }.toMap
      } finally s.close()
    }

    // batch 1 touches windows A and B
    StreamSinks.upsertBatchPartitioned(
      Seq((w1, "d1", 10.0), (w1, "d2", 11.0), (w2, "d1", 20.0))
        .toDF("window_start", "device_id", "v"),
      dir, Seq("window_start", "device_id"), "window_start")
    val partDirs = Files.list(Paths.get(dir)).toArray.map(_.toString).filter(_.contains("p=")).sorted
    assert(partDirs.length == 2, partDirs.mkString(","))
    val aDir = partDirs.head // window A's partition
    val aBefore = fileState(aDir)

    // batch 2 re-emits ONLY window B (late data updates d1, adds d3)
    StreamSinks.upsertBatchPartitioned(
      Seq((w2, "d1", 25.0), (w2, "d3", 30.0)).toDF("window_start", "device_id", "v"),
      dir, Seq("window_start", "device_id"), "window_start")

    // window A's partition was not rewritten: same files, same bytes, same mtimes
    assert(fileState(aDir) == aBefore)

    // and the merged read is correct across both partitions
    val got = StreamSinks.readStore(spark, dir)
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got == Map(
      (w1, "d1") -> 10.0, (w1, "d2") -> 11.0,
      (w2, "d1") -> 25.0, (w2, "d3") -> 30.0))
  }

  test("time travel: the prior committed generation stays readable as the store advances") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-timetravel").toString + "/store"
    StreamSinks.upsertBatch(Seq(("k1", 1.0)).toDF("k", "v"), dir, Seq("k"))
    val g1 = StreamSinks.currentGeneration(dir).get
    StreamSinks.upsertBatch(Seq(("k1", 2.0), ("k2", 5.0)).toDF("k", "v"), dir, Seq("k"))
    val g2 = StreamSinks.currentGeneration(dir).get
    assert(g2 == g1 + 1)
    assert(StreamSinks.listGenerations(dir).containsSlice(Seq(g1, g2)))
    // snapshot-isolation read: the pre-batch state, byte-for-byte
    val old = StreamSinks.readStoreAt(spark, dir, g1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(old == Map("k1" -> 1.0))
    val cur = StreamSinks.readStore(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(cur == Map("k1" -> 2.0, "k2" -> 5.0))
    // a retired/never-written generation is an explicit error
    intercept[IllegalArgumentException] {
      StreamSinks.readStoreAt(spark, dir, g2 + 7)
    }
  }

  test("Trigger.AvailableNow drains the backlog and terminates") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft-avnow").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    writeBatch(dir, "b1", Seq(ev(0, "d1", 10.0), ev(5, "d2", 20.0)))
    val src = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[graft.model.SensorEvent].schema)
      .parquet(s"$dir/in/*")
    val q = src.writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000) // AvailableNow self-terminates when drained
    assert(!q.isActive)
    assert(spark.read.parquet(s"$dir/out").count() == 2)
  }
}
