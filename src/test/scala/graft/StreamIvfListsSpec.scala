package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Clustering, Similarity}
import graft.streaming.StreamIvfLists

/** Stream-ingested IVF lists ∪ base ≡ the batch q266 path: search over
  * the merged index is row-identical however the delta vectors arrive —
  * one batch assignment or N micro-batches across arbitrary boundaries.
  */
class StreamIvfListsSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  test("streamed list ingest across batch boundaries == one-shot batch assignment") {
    implicit val ctx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val emb = sources.Tables(spark, dir, "embeddings")
    val quant = Clustering.kmeans(emb,
      Similarity.IvfNlist, Similarity.IvfIters, Similarity.IvfTrainPct)
    quant.cache(); quant.count() // frozen across the stream hook's batches
    val split = 400L
    val base = Similarity.ivfAssignments(emb.filter($"vec_id" < split), quant)
    val delta = emb.filter($"vec_id" >= split)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toSeq
    assert(delta.nonEmpty)

    val out = java.nio.file.Files.createTempDirectory("sivf-out-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sivf-ckpt-").toString
    val mem = MemoryStream[(Long, Array[Float])]
    val q = StreamIvfLists.ingest(
      mem.toDF().toDF("vec_id", "embedding"), quant, out, ckpt).start()
    try {
      mem.addData(delta.take(delta.size / 2): _*) // batch 1
      q.processAllAvailable()
      mem.addData(delta.drop(delta.size / 2): _*) // batch 2
      q.processAllAvailable()
    } finally q.stop()

    val streamed = StreamIvfLists.readLists(spark, out)
      .withColumn("cent_id", col("cent_id").cast("long"))
    val batchDelta = Similarity.ivfAssignments(emb.filter($"vec_id" >= split), quant)
      .select("cent_id", "cand_id", "ce", "cn")
    // list-level parity: count (a replayed batch would inflate it) + rows
    assert(streamed.count() == batchDelta.count())
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select($"cand_id", $"cent_id", $"cn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(key(streamed) == key(batchDelta))
    // search over (base ∪ streamed) ≡ the q266 batch path
    def search(delta: org.apache.spark.sql.DataFrame) =
      Similarity.ivfTopKFromLists(
        base.select("cent_id", "cand_id", "ce", "cn").unionByName(delta),
        emb, $"vec_id" < 20, k = 5, trained = quant)
        .orderBy("query_id", "rank").collect().map(_.toSeq)
    assert(search(streamed).sameElements(search(batchDelta)))
    quant.unpersist()
  }
}
