package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Classifier
import graft.streaming.StreamCuration

/** Streaming curation gate: the stream path must produce exactly the
  * batch verdicts (same code, stateless), run in append mode with no
  * watermark, and respect the offline-trained boundary.
  */
class StreamCurationSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  private def corpus = {
    val pos = (0 until 20).map { i =>
      (i.toLong, ("the data of a pipeline and more words here now " * 6).trim, "src0")
    }
    val neg = (20 until 40).map { i =>
      (i.toLong, s"short doc number$i", s"src${i % 4 + 1}")
    }
    pos ++ neg
  }

  test("stream verdicts equal batch verdicts; selection respects the trained boundary") {
    val docs = corpus.toDF("doc_id", "text", "source")
    val w = Classifier.trainedWeights(docs, col("source") === "src0")

    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val stream = StreamCuration.curate(
      mem.toDF().toDF("doc_id", "text", "source"), w)
    val q = stream.writeStream.format("memory")
      .queryName("curation").outputMode("append").start()
    // two micro-batches: verdicts must not depend on batch boundaries
    mem.addData(corpus.take(15): _*)
    q.processAllAvailable()
    mem.addData(corpus.drop(15): _*)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("curation").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(3), r.getDouble(4), r.getBoolean(5), r.getBoolean(6))))
      .toMap
    val want = StreamCuration.curate(docs, w).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(3), r.getDouble(4), r.getBoolean(5), r.getBoolean(6))))
      .toMap
    assert(got == want, "stream and batch verdicts diverge")
    assert(got.size == 40)
    // the separable corpus separates: src0 docs selected, the short
    // stopword-free docs rejected by BOTH gates
    val bySource = corpus.map { case (id, _, s) => id -> s }.toMap
    assert(got.forall { case (id, (_, _, _, sel)) => sel == (bySource(id) == "src0") },
      s"selection does not match the planted structure: $got")
  }
}
