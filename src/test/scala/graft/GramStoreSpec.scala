package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.streaming.StreamGramSet
import graft.warehouse.IndexStore

/** The gram-set generation store (the third IndexStore family):
  * gate-then-absorb across micro-batches ≡ batch gates against the
  * growing from-scratch gram sets; compaction repairs files without
  * changing verdicts; crash-replay of a batch re-derives the SAME
  * verdicts (its own fragment is excluded from its view).
  */
class GramStoreSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  private val bp = "g1 g2 g3 g4 g5 g6 g7 g8"

  private def mkRoot() =
    java.nio.file.Files.createTempDirectory("gramstore-").toString

  private def verdictMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_removed"), r.getAs[String]("kept_md5"))))
      .toMap

  test("stream gate-then-absorb equals batch gates against the growing gram sets") {
    implicit val ctx = spark.sqlContext
    val baseDocs = Seq((1L, s"b1 b2 $bp b3", "s")).toDF("doc_id", "text", "source")
    // batch A plants NEW boilerplate that must gate batch B
    val newBp = "n1 n2 n3 n4 n5 n6 n7 n8"
    val batchA: Seq[(Long, String, String)] = Seq(
      (10L, s"a1 a2 $bp a3", "s"), // base boilerplate -> erased
      (11L, s"a4 a5 $newBp a6", "s")) // novel here, boilerplate for B
    val batchB: Seq[(Long, String, String)] = Seq(
      (20L, s"c1 c2 $newBp c3", "s"), // A's boilerplate -> erased
      (21L, "d1 d2 d3 d4 d5 d6 d7 d8 d9", "s")) // untouched

    val root = mkRoot()
    IndexStore.writeBase(Dedup.gramSet(baseDocs), root)
    val buf = scala.collection.mutable.Map.empty[Long, (Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("gramstore-ckpt-").toString
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamGramSet.ingest(mem.toDF().toDF("doc_id", "text", "source"),
      root, ckpt) { (v, _) => buf.synchronized { buf ++= verdictMap(v) } }.start()
    try {
      mem.addData(batchA: _*); q.processAllAvailable()
      mem.addData(batchB: _*); q.processAllAvailable()
    } finally q.stop()

    // batch references: A gated against base; B against base ∪ A's grams
    val aDf = batchA.toDF("doc_id", "text", "source")
    val bDf = batchB.toDF("doc_id", "text", "source")
    val wantA = verdictMap(Dedup.substringGate(aDf, Dedup.gramSet(baseDocs)))
    val wantB = verdictMap(Dedup.substringGate(bDf,
      Dedup.gramSet(baseDocs.unionByName(aDf))))
    assert(buf.toMap == wantA ++ wantB, "stream and batch verdicts diverge")
    assert(buf(10L)._1 == 8L && buf(11L)._1 == 0L)
    assert(buf(20L)._1 == 8L, "batch A's novel boilerplate must gate batch B")
    assert(buf(21L)._1 == 0L)
  }

  test("compaction repairs files and changes no verdict; replay re-derives the same verdicts") {
    val baseDocs = Seq((1L, s"b1 b2 $bp b3", "s")).toDF("doc_id", "text", "source")
    val batchA = Seq((10L, s"a1 a2 $bp a3 x1 x2 x3 x4 x5 x6 x7 x8", "s"))
      .toDF("doc_id", "text", "source")
    val probe = Seq((30L, s"p1 p2 $bp x1 x2 x3 x4 x5 x6 x7 x8 p3", "s"))
      .toDF("doc_id", "text", "source")

    val root = mkRoot()
    IndexStore.writeBase(Dedup.gramSet(baseDocs), root)
    val v1 = verdictMap(StreamGramSet.gateAndAbsorb(batchA, root, 0L))
    // replay the same batch id: the store view must exclude its own
    // fragment, so the verdicts are identical
    val v2 = verdictMap(StreamGramSet.gateAndAbsorb(batchA, root, 0L))
    assert(v1 == v2, "crash-replayed batch changed its verdicts")

    def gate() = verdictMap(Dedup.substringGate(probe,
      IndexStore.read(spark, root, StreamGramSet.GramSchema)))
    val before = gate()
    val filesBefore = IndexStore.dataFileCount(spark, root)
    val c = IndexStore.compact(spark, root, StreamGramSet.GramSchema)
    assert(c.gen == 1L)
    val after = gate()
    assert(before == after, "compaction changed serving verdicts")
    assert(IndexStore.dataFileCount(spark, root) <= filesBefore)
    // the probe's base AND fragment boilerplate are both erased (8+8
    // of its 19 words)
    assert(after(30L)._1 == 16L)
  }

  test("rebase: erased-doc-only grams stop gating; shared grams keep gating") {
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    val erasedOnly = "e1 e2 e3 e4 e5 e6 e7 e8"
    val corpus = Seq(
      (1L, s"x1 $shared x2 $erasedOnly", "de"), // to be erased
      (2L, s"y1 y2 $shared y3", "en")) // survivor also carries `shared`
      .toDF("doc_id", "text", "source")
    val root = mkRoot()
    IndexStore.writeBase(Dedup.gramSet(corpus), root)
    // GDPR erasure of the de doc: rebuild the key set from survivors
    val c = IndexStore.rebase(
      Dedup.gramSet(corpus.filter($"source" =!= "de")), root)
    assert(c.gen == 1L)
    val probe = Seq((10L, s"p1 $shared p2 $erasedOnly p3", "s"))
      .toDF("doc_id", "text", "source")
    val v = verdictMap(Dedup.substringGate(probe,
      IndexStore.read(spark, root, StreamGramSet.GramSchema)))
    // only the SHARED boilerplate still gates: 8 of 19 words erased
    assert(v(10L)._1 == 8L,
      s"expected only the shared span to gate after the rebase: $v")
    // and the store physically contains no erased-only gram
    val eMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(erasedOnly.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val grams = IndexStore.read(spark, root, StreamGramSet.GramSchema)
    assert(grams.filter(col("gk") === eMd5).count() == 0)
    val sMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(shared.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(grams.filter(col("gk") === sMd5).count() == 1)
  }
}
