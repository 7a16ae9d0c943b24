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

  test("b-bit minhash: identical stays 1, debias formula exact, clamped at 0") {
    // synthetic 16-component signatures so the masked-match count is
    // fully controlled: s2 agrees with s1 on the low 2 bits of exactly
    // 10 components (debias: (10/16 − 1/4)/(3/4) = 0.5); s3 agrees on
    // 0 (raw −1/3 → clamped 0); s4 is identical (→ 1.0)
    val sig = Seq(
      (1L +: (0 until 16).map(i => 4L * i)), // low bits 00 everywhere
      (2L +: (0 until 16).map(i => if (i < 10) 4L * i else 4L * i + 1)),
      (3L +: (0 until 16).map(i => 4L * i + 2)),
      (4L +: (0 until 16).map(i => 4L * i))
    ).map { s => (s.head, s(1), s(2), s(3), s(4), s(5), s(6), s(7), s(8),
      s(9), s(10), s(11), s(12), s(13), s(14), s(15), s(16)) }
      .toDF("doc_id", "h0", "h1", "h2", "h3", "h4", "h5", "h6", "h7",
        "h8", "h9", "h10", "h11", "h12", "h13", "h14", "h15")
    val pairs = Seq((1L, 2L, 0.625), (1L, 3L, 0.0), (1L, 4L, 1.0))
      .toDF("d1", "d2", "est_jaccard")
    val r = Dedup.bbitMinhashPairs(pairs, sig, b = 2).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> ((x.getInt(3), x.getDouble(4)))).toMap
    assert(r((1L, 2L)) == ((10, 0.5)))
    assert(r((1L, 3L)) == ((0, 0.0)), "negative debias must clamp to 0")
    assert(r((1L, 4L)) == ((16, 1.0)))
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

  test("soft-dedup weights: 1/cluster_size effective mass, singletons weigh 1") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", "w w w w"), // 4 tokens, in a 2-cluster -> eff 2.0
      (2L, "a", "x y"), // 2 tokens, unclustered -> eff 2.0
      (3L, "b", "p q r s t u")) // 6 tokens, in a 3-cluster -> eff 2.0
      .toDF("doc_id", "source", "text")
    val clusters = Seq((1L, 1L, 2L), (3L, 3L, 3L))
      .toDF("doc_id", "cluster_rep", "cluster_size")
    val r = graft.operators.Dedup.softDedupWeights(docs, clusters).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4), x.getDouble(5)))).toMap
    assert(r("a") == ((2L, 1L, 6L, 4.0, 0.666667)))
    assert(r("b") == ((1L, 1L, 6L, 2.0, 0.333333)))
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
    // truncation at the full width is the identity
    val full = Similarity.truncatedTopK(e, col("vec_id") === 0L, k = 2, d = 4)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val ref = Similarity.bruteForceTopK(e, col("vec_id") === 0L, k = 2)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(full == ref)
    // truncating drops tail signal: cand 2 wins in the 2-d prefix (its
    // tail disagreement is invisible), cand 1 wins full-width
    val e2 = Seq(
      (0L, Array(1f, 0.1f, 0f, 0f), 0),
      (1L, Array(1f, 0f, 0f, 0f), 0),
      (2L, Array(1f, 0.1f, 5f, 0f), 0)
    ).toDF("vec_id", "embedding", "label")
    assert(Similarity.bruteForceTopK(e2, col("vec_id") === 0L, k = 1)
      .head.getLong(1) == 1L)
    assert(Similarity.truncatedTopK(e2, col("vec_id") === 0L, k = 1, d = 2)
      .head.getLong(1) == 2L)
  }

  test("bucketed near-dup pairs: hot label is capped, cold pairs survive") {
    // 3000 identical vectors under one label agree on every hyperplane
    // sign, so they form ONE (label, bucket) block of 3000 > GraphBlockCap
    // — uncapped generation would emit ~4.5M pairs through one reducer;
    // the cap drops the block in bounded time. An exact-duplicate pair
    // under a cold label (same bucket by construction) still pairs up.
    val base = Array.tabulate(64)(i => (1.0f + i * 0.01f))
    val hot = (1 to 3000).map(i => (i.toLong, base, "hot"))
    val cold = Seq((5001L, base, "cold"), (5002L, base, "cold"))
    val e = (hot ++ cold).toDF("vec_id", "embedding", "label")
    val r = Similarity.bucketedNearDupPairs(e, threshold = 0.40)
      .select("label", "v1", "v2", "cosine_sim").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(r.toSeq == Seq(("cold", 5001L, 5002L, 1.0)))
  }

  test("q53 route: component solve over the BOUNDED generator under a hot label") {
    // The q53 graph builder must never see an uncapped pair source:
    // 1500 identical hot-label vectors land in ONE (label, bucket)
    // block > GraphBlockCap, which the bounded generator drops in
    // bounded time (the uncapped q45 contract would feed ~1.1M edges
    // into the component solve). The cold exact-duplicate pair still
    // clusters, proving the drop prunes the hot block, not the signal.
    val base = Array.tabulate(64)(i => (1.0f + i * 0.01f))
    val hot = (1 to 1500).map(i => (i.toLong, base, "hot"))
    val cold = Seq((5001L, base, "cold"), (5002L, base, "cold"))
    val e = (hot ++ cold).toDF("vec_id", "embedding", "label")
    val cc = Dedup.connectedComponents(
        Similarity.bucketedNearDupPairs(e, threshold = 0.40)
          .select(col("v1").as("d1"), col("v2").as("d2")))
      .select("doc_id", "cluster_rep").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cc == Set((5001L, 5001L), (5002L, 5001L)))
  }

  test("hard negatives exclude same-label positives and rank by similarity") {
    val rng = new scala.util.Random(53)
    val base = Array.fill(64)((rng.nextDouble() * 2 - 1).toFloat)
    def jitter(eps: Float) =
      base.zipWithIndex.map { case (x, i) => x + (if (i % 2 == 0) eps else -eps) }
    val e = Seq(
      (0L, base, "a"), // query
      (1L, jitter(0.001f), "a"), // same-label positive — must never appear
      (2L, jitter(0.002f), "b"),
      (3L, jitter(0.003f), "c"),
      (4L, base.map(-_), "d") // negated: opposite sign on every plane → other bucket
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.hardNegatives(e, col("vec_id") === 0L, k = 5)
      .orderBy("rank").select("cand_id", "rank").collect()
      .map(x => (x.getLong(0), x.getInt(1))).toSeq
    assert(r == Seq((2L, 1), (3L, 2)), r.toString)
  }

  test("semDedup keeps exactly the farthest-from-centroid member per dup group") {
    val rng = new scala.util.Random(47)
    def rand() = Array.fill(64)((rng.nextDouble() * 2 - 1).toFloat)
    // background corpus + two planted near-identical groups (jittered
    // copies: cosine > 0.999, so same cluster AND same sign bucket)
    val bg = (0 until 80).map(i => (i.toLong, rand()))
    def jitter(v: Array[Float], eps: Float) =
      v.zipWithIndex.map { case (x, i) => x + (if (i % 2 == 0) eps else -eps) }
    val g1base = rand()
    val g1 = Seq((100L, g1base), (101L, jitter(g1base, 0.001f)), (102L, jitter(g1base, 0.002f)))
    val g2base = rand()
    val g2 = Seq((200L, g2base), (201L, jitter(g2base, 0.001f)))
    val e = (bg ++ g1 ++ g2).toDF("vec_id", "embedding")
    val r = Similarity.semDedup(e).collect()
      .map(x => (x.getLong(0), (x.getDouble(2), x.getLong(3), x.getLong(4), x.getBoolean(5))))
      .toMap
    assert(r.size == 85)
    // planted groups found (members may pull in a background straggler,
    // but each planted member must sit in its plant's group)
    for (ids <- Seq(Seq(100L, 101L, 102L), Seq(200L, 201L))) {
      val reps = ids.map(r(_)._2).distinct
      assert(reps.size == 1, s"planted group $ids split: $reps")
      val members = r.filter(_._2._2 == reps.head).toSeq
      assert(members.size.toLong == r(ids.head)._3)
      // exactly one keep: the min (cent_cos, vec_id) member
      val kept = members.filter(_._2._4).map(_._1)
      val expected = members.minBy(m => (m._2._1, m._1))._1
      assert(kept == Seq(expected), s"group $ids kept $kept, expected $expected")
    }
    // global invariant over EVERY group (random background vectors may
    // legitimately pair too): exactly one keep per group — the minimal
    // (cent_cos, vec_id) member — and size matches the membership
    r.toSeq.groupBy(_._2._2).foreach { case (rep, members) =>
      assert(members.forall(_._2._3 == members.size.toLong), s"group $rep size mismatch")
      val kept = members.filter(_._2._4).map(_._1)
      val expected = members.minBy(m => (m._2._1, m._1))._1
      assert(kept == Seq(expected), s"group $rep kept $kept, expected $expected")
    }
  }

  test("edit-distance pairs find typo near-dups within a cold block") {
    val d = Seq(
      (1L, "cold start alpha beta gamma delta"),
      (2L, "cold start alpha beta gamma deltq"), // 1 edit from doc 1
      (3L, "other opener entirely different text")
    ).toDF("doc_id", "text")
    val r = Dedup.editDistancePairs(d).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getInt(2)))
    assert(r.toSeq == Seq((1L, 2L, 1)))
  }

  test("edit-distance block cap bounds a 10k-doc hot block") {
    // 10 000 docs share the blocking key "dup dup" AND the same length
    // bucket: uncapped blocking would emit ~50M candidate pairs through
    // one reducer. The cap refines the hot block by length bucket, finds
    // the refined bucket still hot, and drops it — bounded work, zero
    // pairs from the boilerplate block. A cold block in the same corpus
    // still yields its pair (recall outside hot blocks is untouched).
    val hot = (1 to 10000).map(i => (1000L + i, s"dup dup pad$i"))
    val cold = Seq(
      (1L, "cold start alpha beta gamma delta"),
      (2L, "cold start alpha beta gamma deltq"))
    val d = (hot ++ cold).toDF("doc_id", "text")
    val r = Dedup.editDistancePairs(d).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getInt(2)))
    assert(r.toSeq == Seq((1L, 2L, 1)))
  }

  test("edit-distance length-bucket refinement keeps recall in spread hot blocks") {
    // 60 docs share "spread out" (over the 50-doc cap) but split across
    // two length buckets of 30 — refinement keeps both buckets, so
    // near-identical docs inside each bucket still pair up.
    val shortDocs = (1 to 30).map(i => (100L + i, f"spread out s$i%02d")) // len 13 -> bucket 0
    val longDocs = (1 to 30).map(i =>
      (200L + i, f"spread out longer filler words here l$i%02d")) // len 37 -> bucket 1
    val d = (shortDocs ++ longDocs).toDF("doc_id", "text")
    val r = Dedup.editDistancePairs(d, maxDist = 4).collect()
    // within-bucket pairs survive (any two short docs differ by <= 2 edits)
    assert(r.nonEmpty)
    val ids = r.map(x => (x.getLong(0), x.getLong(1)))
    assert(ids.forall { case (a, b) => (a < 200) == (b < 200) }) // no cross-bucket pairs
    assert(ids.exists { case (a, b) => a > 100 && b < 200 })
  }

  test("winnowing selection matches a plain-Scala MOSS reimplementation") {
    import java.security.MessageDigest
    def md5hex(s: String): String = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h32(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(8), 16)
    val (k, w) = (Dedup.WinnowK, Dedup.WinnowW)
    def expected(words: Seq[String]): Set[(Int, Long)] = {
      val n = words.length
      if (n < k + w - 1) Set.empty
      else {
        val g = (1 to n - k + 1).map(i => i -> h32(words.slice(i - 1, i - 1 + k).mkString(" ")))
        (w to g.length).flatMap { e =>
          val win = g.slice(e - w, e)
          Some(win.minBy { case (i, gh) => (gh, -i) }) // min hash, rightmost
        }.toSet
      }
    }
    val docs = Seq(
      (1L, (1 to 30).map(i => s"a${(i * 3) % 11}")),
      (2L, (1 to 9).map(i => s"b$i")),
      (3L, (1 to 5).map(i => s"c$i"))) // 3 grams < w windows -> none
    val df = docs.map { case (id, ws) => (id, ws.mkString(" ")) }.toDF("doc_id", "text")
    val got = Dedup.winnowSelected(df, "text").collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getLong(1)))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    for ((id, ws) <- docs)
      assert(got.getOrElse(id, Set.empty) == expected(ws), s"doc $id")
  }

  test("winnowing guarantee: a shared run of w+k-1 words shares a fingerprint") {
    val run = "one two three four five six" // = w+k-1 = 6 words
    val df = Seq(
      (1L, s"alpha beta gamma $run delta epsilon"),
      (2L, s"zeta eta $run theta iota kappa lambda"),
      (3L, "unrelated words entirely disjoint vocabulary here present")
    ).toDF("doc_id", "text")
    val fp = Dedup.winnowSelected(df, "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert((fp(1L) & fp(2L)).nonEmpty, "docs sharing the 6-word run must share a fingerprint")
    assert((fp(1L) & fp(3L)).isEmpty && (fp(2L) & fp(3L)).isEmpty)
    val pairs = Dedup.winnowOverlapPairs(df, threshold = 0.01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("winnowing overlap is a true coefficient on repetitive docs") {
    // a phrase cycled through a doc selects the same hash at many
    // positions: multiset counting would square those occurrences
    // (overlap >> 1); set semantics keep the metric in [0, 1]
    val loop = Seq.fill(50)("spam ham eggs").mkString(" ")
    val df = Seq(
      (1L, loop),
      (2L, s"prefix words here $loop suffix words there"),
      (3L, "fresh disjoint vocabulary with no repeats at all whatsoever")
    ).toDF("doc_id", "text")
    val rows = Dedup.winnowOverlapPairs(df, threshold = 0.01).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val ov = r.getDouble(3)
      assert(ov > 0 && ov <= 1.0, s"overlap $ov out of [0,1] for (${r.getLong(0)},${r.getLong(1)})")
    }
    assert(rows.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L && r.getDouble(3) > 0.8))
  }
}
