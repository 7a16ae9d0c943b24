package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Sketch
import graft.streaming.StreamBloom

class StreamBloomSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  private val members = Seq(3L, 9L, 21L, 33L).toDF("user_id")

  test("streamed bloom gate across micro-batches == plain batch semi join") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val q = StreamBloom.gate(mem.toDF().toDF("user_id", "value"), members, "user_id")
      .writeStream.format("memory").queryName("bloom_gate").outputMode("append").start()
    try {
      mem.addData((1L, 0.5), (3L, 1.5), (9L, 2.5)) // batch 1
      q.processAllAvailable()
      mem.addData((21L, 3.5), (22L, 4.5), (3L, 5.5)) // batch 2
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("bloom_gate")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    // exact contract: ≡ the unfiltered semi join on the same rows
    assert(streamed == Set((3L, 1.5), (9L, 2.5), (21L, 3.5), (3L, 5.5)))
  }

  test("the literal filter has no false negatives and the gate removes false positives") {
    val events = (1L to 300L).map(i => (i, i.toDouble)).toDF("user_id", "value")
    val gated = StreamBloom.gate(events, members, "user_id")
      .select("user_id").as[Long].collect().toSet
    assert(gated == Set(3L, 9L, 21L, 33L)) // exact despite any bloom false positives
    // and the pre-filter alone keeps every member (zero false negatives)
    val pre = events.filter(
      Sketch.bloomMaybeContains(StreamBloom.bloomLiteral(members, "user_id"), col("user_id")))
      .select("user_id").as[Long].collect().toSet
    assert(Set(3L, 9L, 21L, 33L).subsetOf(pre))
    assert(pre.size < 300) // and it actually drops non-members
  }
}
