package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

class DedupSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away today"
  private val docs = Seq(
    (0L, base),
    (1L, base + " tonight maybe"), // near-duplicate of 0
    (2L, "completely different words about spark query engines and shuffles here"),
    (3L, base) // exact duplicate of 0
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val r = Dedup.exact(docs).collect()
    assert(r.length == 3)
    val dupGroup = r.find(_.getLong(2) == 2L).get
    assert(dupGroup.getLong(1) == 0L) // kept_doc_id = min
  }

  test("ngram jaccard finds the near-dup pair, not the unrelated one") {
    val pairs = Dedup.ngramJaccardPairs(docs)
      .select("d1", "d2", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) > 0.5)
    assert(pairs.contains((0L, 3L)) && pairs((0L, 3L)) == 1.0)
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((1L, 2L)))
  }

  test("minhash: identical docs have identical signatures, est_jaccard 1.0") {
    val pairs = Dedup.minhashPairs(docs)
      .select("d1", "d2", "est_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 3L)) == 1.0)
    assert(pairs.get((0L, 1L)).forall(_ > 0.5)) // near-dup collides in some band
  }

  test("simhash: exact dups at hamming 0, near-dups within threshold") {
    val pairs = Dedup.simhashPairs(docs)
      .select("d1", "d2", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((0L, 3L)) == 0)
  }

  test("rolling fingerprint matches an independent Scala fold") {
    import java.security.MessageDigest
    def h32(s: String): Long = {
      val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    val expected = base.split(" ").foldLeft(0L)((acc, t) =>
      (acc * 31 + h32(t)) % TextAnalysis.RollingFpMod)
    val got = TextAnalysis.withFingerprint(docs.filter($"doc_id" === 0L))
      .select("rolling_fp").head.getLong(0)
    assert(got == expected)
  }

  test("duplicate spans: cross-doc 8-gram runs merge into maximal ranges") {
    // w1..w12 shared prefix (12 words) then unique tails; doc 30 is unrelated
    val shared = (1 to 12).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (10L, shared + " apple banana cherry date elder fig grape haw iris"),
      (20L, shared + " kiwi lemon mango nectar olive peach quince rose sage"),
      (30L, (1 to 25).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(d)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    // shared 12 words -> dup 8-gram positions 1..5 in both docs, one
    // merged span covering words 1..12; doc 30 contributes nothing
    assert(spans.toSeq == Seq((10L, 1, 12, 5L), (20L, 1, 12, 5L)))
  }

  test("duplicate spans: same-doc repetition alone is not a duplicate") {
    val rep = ((1 to 10).map(i => s"r$i") ++ (1 to 10).map(i => s"r$i")).mkString(" ")
    val d = Seq(
      (1L, rep), // 8-grams repeat WITHIN the doc only
      (2L, (1 to 30).map(i => s"u$i").mkString(" "))
    ).toDF("doc_id", "text")
    assert(Dedup.duplicateSpans(d).count() == 0)
  }

  test("embedding near-dup and brute-force top-k ordering") {
    val e = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(0.99f, 0.1f, 0f, 0f), 0),
      (2L, Array(0f, 1f, 0f, 0f), 0),
      (3L, Array(0f, 0f, 1f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val nd = Similarity.nearDupPairs(e, 0.9).select("v1", "v2").collect()
    assert(nd.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 1L)))
    val topk = Similarity.bruteForceTopK(e, col("vec_id") === 0L, k = 2)
      .orderBy("rank").select("cand_id").collect().map(_.getLong(0)).toSeq
    assert(topk == Seq(1L, 2L)) // most similar first, orthogonal second
  }
}
