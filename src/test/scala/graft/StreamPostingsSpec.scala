package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis
import graft.streaming.StreamPostings

/** Stream-ingested postings ∪ base artifact ≡ the q260 batch
  * incremental path: phrase results over the merged index are
  * row-identical however the delta arrives — one batch job or N
  * micro-batches across arbitrary boundaries.
  */
class StreamPostingsSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  test("stream-ingested postings ∪ base == the batch incremental path across batch boundaries") {
    implicit val ctx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val docs = sources.Tables(spark, dir, "documents")
    val split = warehouse.PipelineQueries.IncrementalSplit
    val base = TextAnalysis.positionalPostings(docs.filter($"doc_id" < split))
    val delta = docs.filter($"doc_id" >= split)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    assert(delta.nonEmpty)

    val out = java.nio.file.Files.createTempDirectory("spost-out-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("spost-ckpt-").toString
    val mem = MemoryStream[(Long, String)]
    val q = StreamPostings.ingest(mem.toDF().toDF("doc_id", "text"), out, ckpt).start()
    try {
      mem.addData(delta.take(delta.size / 2): _*) // batch 1
      q.processAllAvailable()
      mem.addData(delta.drop(delta.size / 2): _*) // batch 2
      q.processAllAvailable()
    } finally q.stop()

    val streamed = StreamPostings.readPostings(spark, out)
    val batchDelta = TextAnalysis.positionalPostings(docs.filter($"doc_id" >= split))
    // posting-level parity: count (a replayed batch would inflate it) + set
    assert(streamed.count() == batchDelta.count())
    assert(streamed.collect().map(_.toSeq).toSet ==
      batchDelta.collect().map(_.toSeq).toSet)
    // phrase search over (base ∪ streamed) ≡ the q260 batch path
    def phrases(delta: org.apache.spark.sql.DataFrame) =
      TextAnalysis.phraseSearchPostings(
        base.unionByName(delta.select("doc_id", "pos", "word")),
        TextAnalysis.PhraseQueriesNgram)
        .collect().map(_.toSeq)
    assert(phrases(streamed).sameElements(phrases(batchDelta)))
  }

  test("ingest refuses an outDir holding root-level data files") {
    implicit val ctx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("spost-legacy-").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out, "part-00000.parquet"), Array[Byte](1))
    val mem = MemoryStream[(Long, String)]
    val e = intercept[IllegalArgumentException] {
      StreamPostings.ingest(mem.toDF().toDF("doc_id", "text"), out, out + "/cp")
    }
    assert(e.getMessage.contains("root-level"))
  }
}
