package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.streaming.StreamDhash

class StreamDhashSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  // every doc comfortably over DHashMinChars (72)
  private val base =
    "the quick brown fox jumps over the lazy dog while seventeen engines shuffle partitions"
  private val indexDocs = Seq(
    0L -> base,
    1L -> "a completely different corpus line about broadcast joins and sort merge strategies here")
  private val newDocs = Seq(
    10L -> base, // dup of index doc 0
    11L -> (base + " x"), // near-dup of index doc 0
    12L -> "novel text that matches nothing in the index at all besides being long enough to pool")

  test("streamed index matches across micro-batch boundaries == one-shot batch operator") {
    implicit val ctx = spark.sqlContext
    val index = Multimodal.withDhash(indexDocs.toDF("doc_id", "text"))
    // pre-resolve to a stable frame: the stream hook reuses it per batch
    index.cache(); index.count()
    val out = java.nio.file.Files.createTempDirectory("sdh-out-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sdh-ckpt-").toString
    val mem = MemoryStream[(Long, String)]
    val q = StreamDhash.matchAgainstIndex(
      mem.toDF().toDF("doc_id", "text"), index, out, ckpt).start()
    try {
      mem.addData(newDocs(0)) // batch 1
      q.processAllAvailable()
      mem.addData(newDocs(1), newDocs(2)) // batch 2
      q.processAllAvailable()
    } finally q.stop()
    // count (not just set) equality: a replayed/duplicated batch would
    // inflate the row count even when the distinct set still matches
    val streamRows = spark.read.parquet(out)
      .select("doc_id", "n_matches", "min_hamming", "best_match")
    assert(streamRows.count() == newDocs.size.toLong)
    val stream = streamRows
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1 else r.getInt(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val batch = Multimodal.dhashIndexMatches(
      Multimodal.withDhash(newDocs.toDF("doc_id", "text")), index)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1 else r.getInt(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(stream == batch, s"stream $stream vs batch $batch")
    // the dup matches index doc 0 at Hamming 0; the novel doc matches nothing
    assert(batch.exists(t => t._1 == 10L && t._2 >= 1L && t._3 == 0 && t._4 == 0L))
    assert(batch.exists(t => t._1 == 12L && t._2 == 0L && t._3 == -1))
    index.unpersist()
  }
}
