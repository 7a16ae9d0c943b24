package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Corpus
import graft.streaming.{StreamCdc, StreamSinks}

/** Stream ≡ batch proof for the content-defined chunker: documents
  * arriving across micro-batch boundaries chunk identically to the
  * batch window-formulation operator, and a re-delivered document
  * upserts in place (idempotent on (doc_id, chunk_idx)).
  */
class StreamCdcSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  // deterministic multi-chunk texts: ~8-word expected chunks, so ~60
  // words yield several content-defined boundaries per doc
  private def text(seed: Long, n: Int): String =
    (0 until n).map(i => s"w${(seed * 31 + i * 7) % 23}").mkString(" ")

  private val docRows: Seq[(Long, String)] = Seq(
    (1L, text(1, 60)),
    (2L, text(2, 75)),
    (3L, text(1, 60)),   // exact dup of doc 1: identical chunk_md5 stream
    (4L, text(4, 2)),    // shorter than the hash window: one chunk
    (5L, text(5, 64)))

  private def canon(df: org.apache.spark.sql.DataFrame) = df
    .select("doc_id", "chunk_idx", "start_word", "n_words", "chunk_md5")
    .orderBy("doc_id", "chunk_idx")
    .collect().map(_.toSeq).toSeq

  test("chunkDocs (array form) equals Corpus.cdcChunks (window form) on a batch") {
    val docs = docRows.toDF("doc_id", "text")
    assert(canon(StreamCdc.chunkDocs(docs)) == canon(Corpus.cdcChunks(docs)))
    // boundaries actually fired: some doc has several chunks
    assert(StreamCdc.chunkDocs(docs).filter($"chunk_idx" > 0).count() > 0)
  }

  test("streaming chunker equals batch across micro-batch boundaries") {
    val dir = Files.createTempDirectory("graft-streamcdc").toString
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]

    val chunked = StreamCdc.chunkDocs(mem.toDF().toDF("doc_id", "text"))
    val q = StreamSinks.parquetUpsert(
      chunked, s"$dir/chunks", Seq("doc_id", "chunk_idx"),
      s"$dir/ckpt", "1 seconds").start()

    // slice the corpus across three micro-batches, re-delivering doc 1
    // in the last one (at-least-once delivery must not duplicate rows)
    mem.addData(docRows(0), docRows(1))
    q.processAllAvailable()
    mem.addData(docRows(2), docRows(3))
    q.processAllAvailable()
    mem.addData(docRows(4), docRows(0))
    q.processAllAvailable()
    q.stop()

    val streamed = StreamSinks.readStore(spark, s"$dir/chunks")
    val batch = Corpus.cdcChunks(docRows.toDF("doc_id", "text"))
    assert(canon(streamed) == canon(batch))
    // the duplicate docs (1 and 3) carry identical chunk hash streams
    val h = streamed.filter($"doc_id".isin(1L, 3L))
      .groupBy("doc_id").agg(sort_array(collect_list("chunk_md5")).as("hs"))
      .collect().map(_.getSeq[String](1)).toSeq
    assert(h.size == 2 && h.head == h(1))
  }
}
