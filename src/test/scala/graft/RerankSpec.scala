package graft

import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Standardization + MMR re-rank semantics against plain-Scala
  * reimplementations (the cross-engine bit-exactness is separately
  * hash-checked by q169/q170's DuckDB oracles).
  */
class RerankSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, RoundingMode.HALF_UP).toDouble

  private def dec6(v: Double): BigDecimal =
    BigDecimal(v).setScale(6, RoundingMode.HALF_UP)

  private def dot(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.foldLeft(0.0)(_ + _)

  private def cos(a: Array[Float], b: Array[Float]): Double =
    round6(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))

  // dyadic values keep every decimal cast exact-friendly
  private def vec(i: Int): Array[Float] =
    Array.tabulate(4)(j => ((i % 5) * 0.125 + j * 0.0625 + (i * j % 3) * 0.25).toFloat)

  test("adaptive two-stage retrieval: m >= corpus is exactly brute force; small m stays a rerank of the coarse list") {
    val emb = (0L until 40L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")
    val pred = col("vec_id") < 5
    // the exact full-width reference
    val brute = Similarity.bruteForceTopK(emb, pred, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    // m covering every candidate -> the coarse stage cannot lose anyone
    val full = Similarity.adaptiveTopK(emb, pred, k = 10, d = 2, m = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(full == brute, "m=corpus adaptive must equal exact brute force")
    // small m: every result must come from the coarse top-m, re-scored
    // with the FULL-width cosine (not the truncated one)
    val m = 6
    val coarse = Similarity.truncatedTopK(emb, pred, k = m, d = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    Similarity.adaptiveTopK(emb, pred, k = 10, d = 2, m = m).collect().foreach { r =>
      val (q, c, s) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(coarse.contains((q, c)), s"($q,$c) not in the coarse top-$m")
      assert(s == cos(vecs(q), vecs(c)), "rerank score must be the full-width cosine")
    }
  }

  // 64-dim deterministic mixed-sign vectors (some exact zeros — the
  // bit-clear edge) for the binary-sketch path
  private def vec64(i: Int): Array[Float] =
    Array.tabulate(64)(j => (((i * 31 + j * 17) % 7) - 3) * 0.125f)

  test("binary sketch packs sign bits exactly; m=corpus hamming+rerank equals brute force") {
    val e1 = Array.tabulate(64)(j => if (j % 3 == 0) 1.0f else -1.0f)
    val sk = Similarity.binarySketch(Seq((1L, e1)).toDF("vec_id", "embedding")).head()
    def expectWord(base: Int) =
      (0 until 32).filter(j => (base + j) % 3 == 0).map(j => 1L << j).sum
    assert(sk.getLong(1) == expectWord(0) && sk.getLong(2) == expectWord(32))
    // exact zero is NOT positive → bit stays clear
    val z = Similarity.binarySketch(
      Seq((2L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding")).head()
    assert(z.getLong(1) == 0L && z.getLong(2) == 0L)

    val emb = (0L until 40L).map(i => (i, vec64(i.toInt))).toDF("vec_id", "embedding")
    val pred = col("vec_id") < 5
    val brute = Similarity.bruteForceTopK(emb, pred, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    // m covering every candidate → the Hamming cut cannot lose anyone
    val full = Similarity.binaryTopK(emb, pred, k = 10, m = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(full == brute, "m=corpus binary retrieval must equal exact brute force")
    // small m: every served pair must come from the Hamming top-m
    // (ties by cand_id), re-scored with the FULL-width cosine
    val m = 6
    val words = Similarity.binarySketch(emb).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def ham(a: Long, b: Long) = (java.lang.Long.bitCount(words(a)._1 ^ words(b)._1)
      + java.lang.Long.bitCount(words(a)._2 ^ words(b)._2))
    val coarse = (0L until 5L).flatMap { q =>
      (0L until 40L).filter(_ != q).map(c => (q, c))
        .sortBy { case (_, c) => (ham(q, c), c) }.take(m)
    }.toSet
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    Similarity.binaryTopK(emb, pred, k = 10, m = m).collect().foreach { r =>
      val (q, c, s) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(coarse.contains((q, c)), s"($q,$c) not in the Hamming top-$m")
      assert(s == cos(vecs(q), vecs(c)), "rerank score must be the full-width cosine")
    }
  }

  test("knn-shapley equals brute-force subset enumeration of the Shapley definition") {
    val k = 2
    // 1 validation point (id 0) + 6 train points, mixed labels
    val labels = Map(1L -> 0L, 2L -> 1L, 3L -> 0L, 4L -> 1L, 5L -> 0L, 6L -> 1L)
    val valLabel = 0L
    val emb = ((0L, vec(0), valLabel) +: labels.toSeq.sortBy(_._1).map { case (i, l) => (i, vec(i.toInt), l) })
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.knnShapley(emb, col("vec_id") === 0L, k = k).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // brute force: v(S) = (1/K) * sum of hits among the min(K,|S|)
    // nearest members of S (rounded cosine desc, id asc — the
    // operator's ranking convention)
    val q = vec(0)
    val byNear = labels.keys.toSeq.sortBy(i => (-cos(q, vec(i.toInt)), i))
    def v(s: Set[Long]): Double =
      if (s.isEmpty) 0.0
      else byNear.filter(s).take(k).count(i => labels(i) == valLabel).toDouble / k
    def fact(n: Int): Double = (1 to n).foldLeft(1.0)(_ * _)
    val n = labels.size
    val brute = labels.keys.map { i =>
      val others = labels.keySet - i
      val s = others.subsets().map { sub =>
        fact(sub.size) * fact(n - sub.size - 1) / fact(n) * (v(sub + i) - v(sub))
      }.sum
      i -> s
    }.toMap
    labels.keys.foreach { i =>
      assert(math.abs(got(i) - brute(i)) < 1e-5,
        s"vec $i: closed form ${got(i)} vs enumeration ${brute(i)}")
    }
    // efficiency axiom: values sum to v(everything)
    assert(math.abs(got.values.sum - v(labels.keySet)) < 1e-4)
  }

  test("ERR matches the hand-computed cascade on known rankings") {
    // q1: relevant at ranks 1 and 3 → 0.5/1 + (0.5·0.5)/3 = 0.583333
    // q2: relevant at rank 2 only → 0.5/2 = 0.25
    // q3: nothing relevant → 0
    val exact = Seq((1L, 10L), (1L, 30L), (2L, 20L))
      .toDF("query_id", "cand_id")
    val approx = Seq(
      (1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3),
      (2L, 10L, 1), (2L, 20L, 2), (2L, 30L, 3),
      (3L, 40L, 1), (3L, 50L, 2))
      .toDF("query_id", "cand_id", "rank")
    val r = Similarity.errAtK(exact, approx).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(r(1L) == ((2L, round6(0.5 + 0.25 / 3))))
    assert(r(2L) == ((1L, 0.25)))
    assert(r(3L) == ((0L, 0.0)))
  }

  test("count-capped knn-shapley equals the pct spelling on the same validation set") {
    val emb = (0L until 30L).map(i => (i, vec(i.toInt), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
    val n = 6
    // the capped sample is by definition the n smallest (md5-hash, id)
    // ids — feed exactly that set to the pct-style predicate spelling
    // and the two operators must agree row-for-row
    val ids = emb
      .select(col("vec_id"), graft.functions.Hashes.md5Long32(col("vec_id").cast("string")).as("h"))
      .orderBy("h", "vec_id").limit(n).collect().map(_.getLong(0))
    val viaPred = Similarity.knnShapley(emb, col("vec_id").isin(ids: _*), k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    val capped = Similarity.knnShapleyCapped(emb, nVal = n, k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(capped == viaPred, "capped and predicate spellings must agree")
    assert(capped.size == 30 - n, "every train point is valued")
  }

  test("standardize matches the plain-Scala population z-score, any partitioning") {
    val n = 24
    val rows = (0 until n).map(i => (i.toLong, vec(i)))
    val emb = rows.toDF("vec_id", "embedding")
    val xs = Array.tabulate(4)(j => rows.map(_._2(j).toDouble).toArray)
    val expected = Array.tabulate(4) { j =>
      val s = xs(j).map(dec6).sum.toDouble
      val s2 = xs(j).map(x => dec6(x * x)).sum.toDouble
      val mu = s / n
      val sigma = math.sqrt(math.max(s2 - s * s / n, 0.0) / n)
      (mu, sigma)
    }
    for (df <- Seq(emb, emb.repartition(7))) {
      val got = Similarity.standardize(df, dim = 4).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      assert(got.size == n)
      rows.foreach { case (id, v) =>
        val want = Array.tabulate(4) { j =>
          val (mu, sigma) = expected(j)
          if (sigma > 0) round6((v(j).toDouble - mu) / sigma) else 0.0
        }
        assert(got(id).zip(want).forall { case (a, b) => math.abs(a - b) < 1e-9 },
          s"vec $id: ${got(id).toSeq} vs ${want.toSeq}")
      }
    }
  }

  test("mmr re-rank matches plain-Scala greedy MMR and diversifies near-dups") {
    // vectors 0..2 are queries; 10/11 are near-identical high-relevance
    // candidates so plain top-k would pick both, MMR must not pick them
    // back-to-back.
    val base = (0 until 12).map(i => (i.toLong, vec(i)))
    val rows = base.map {
      case (10L, _) => (10L, Array(1.0f, 1.0f, 0.5f, 0.25f))
      case (11L, _) => (11L, Array(1.0f, 0.9999f, 0.5f, 0.25f))
      case (0L, _) => (0L, Array(1.0f, 0.95f, 0.45f, 0.3f))
      case other => other
    }
    val emb = rows.toDF("vec_id", "embedding")
    // λ=0.5 weighs diversity enough that the planted near-dup pair is
    // provably split; q170 runs the production λ=0.7 against the oracle
    val k = 3; val pool = 6; val lambda = 0.5
    val mu = 1.0 - lambda
    val byId = rows.toMap

    // exact-decimal scoring, mirroring the engine: λ and 1−λ are 1-dp
    // decimals, qsim/div are 6-dp, so the score is exact at 7 dp
    val lamBD = BigDecimal(lambda).setScale(1, RoundingMode.HALF_UP)
    val muBD = BigDecimal(mu).setScale(1, RoundingMode.HALF_UP)
    def refMmr(q: Long): Seq[(Int, Long, Double)] = {
      val cands = rows.map(_._1).filter(_ != q)
        .map(c => c -> cos(byId(q), byId(c)))
        .sortBy { case (c, s) => (-s, c) }.take(pool)
      val pair = (for ((a, _) <- cands; (b, _) <- cands if a != b)
        yield (a, b) -> cos(byId(a), byId(b))).toMap
      var selected = Vector.empty[(Int, Long, Double)]
      for (step <- 1 to k) {
        val picked = selected.map(_._2).toSet
        val scored = cands.filterNot { case (c, _) => picked(c) }.map { case (c, qs) =>
          val score =
            if (step == 1) lamBD * dec6(qs)
            else lamBD * dec6(qs) - muBD * dec6(selected.map(s => pair((c, s._2))).max)
          (c, score)
        }
        val (c, sc) = scored.minBy { case (c, s) => (-s, c) }
        selected :+= ((step, c, sc.toDouble))
      }
      selected
    }

    val got = Similarity.mmrTopK(emb, col("vec_id") < 3, k = k, pool = pool, lambda = lambda)
      .orderBy("query_id", "step").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == 3 * k)
    for (q <- 0L until 3L) {
      val want = refMmr(q)
      val g = got.filter(_._1 == q).sortBy(_._2).map(t => (t._2, t._3, t._4))
      assert(g.map(t => (t._1, t._2)).toSeq == want.map(t => (t._1, t._2)),
        s"query $q picks: $g vs $want")
      g.zip(want).foreach { case (a, b) => assert(math.abs(a._3 - b._3) < 1e-9) }
    }
    // diversification: for query 0 the two near-identical top candidates
    // (10, 11) must NOT both be selected in the first two steps
    val q0 = got.filter(_._1 == 0L).sortBy(_._2).map(_._3)
    assert(!(q0.take(2).toSet == Set(10L, 11L)),
      s"MMR picked both near-dups back-to-back: ${q0.toSeq}")
  }

  test("k-center coreset walks farthest-first and is partitioning-invariant") {
    // a tight cluster at the origin plus two far points: whatever the
    // hash-seeded start, the two far points must be picked by step 3,
    // and each round's dist_to_selected is non-increasing... (farthest
    // remaining distance shrinks as coverage grows)
    val rows = (0 until 20).map { i =>
      val v =
        if (i == 17) Array(100f, 0f, 0f, 0f)
        else if (i == 18) Array(-100f, 0f, 0f, 0f)
        else Array.tabulate(4)(j => (i * 0.01f + j * 0.005f))
      (i.toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val a = Similarity.kCenterCoreset(emb, k = 4).orderBy("step").collect()
      .map(r => (r.getInt(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    val b = Similarity.kCenterCoreset(emb.repartition(7), k = 4).orderBy("step").collect()
      .map(r => (r.getInt(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(a.toSeq == b.toSeq, "coreset must not depend on partitioning")
    assert(a.length == 4 && a.head._3.isEmpty)
    val picked3 = a.take(3).map(_._2).toSet
    assert(Set(17L, 18L).subsetOf(picked3), s"far points not covered first: ${a.toSeq}")
    val dists = a.drop(1).map(_._3.get)
    assert(dists.zip(dists.drop(1)).forall { case (x, y) => y <= x },
      s"covering radius must shrink: ${dists.toSeq}")
    // corpus smaller than k: stops with the whole corpus, no error
    val tiny = rows.take(3).toDF("vec_id", "embedding")
    assert(Similarity.kCenterCoreset(tiny, k = 8).count() == 3)
  }

  test("kendallTauB: +1 on agreement, -1 on reversal, 0 on a crossed pair; every query reports") {
    def rk(rows: Seq[(Long, Long, Int)], c: String) =
      rows.toDF("query_id", "cand_id", c)
    // q1: identical order (tau 1); q2: fully reversed (tau -1);
    // q3: 3 candidates with exactly one swapped pair (tau 1/3);
    // q4: only in ranking a, no common candidates -> NULL tau, still reports
    val a = rk(Seq((1L, 10L, 1), (1L, 11L, 2),
      (2L, 10L, 1), (2L, 11L, 2),
      (3L, 10L, 1), (3L, 11L, 2), (3L, 12L, 3),
      (4L, 10L, 1)), "rank_a")
    val b = rk(Seq((1L, 10L, 1), (1L, 11L, 2),
      (2L, 10L, 2), (2L, 11L, 1),
      (3L, 10L, 2), (3L, 11L, 1), (3L, 12L, 3),
      (5L, 99L, 1)), "rank_b")
    val r = Similarity.kendallTauB(a, b).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3),
        if (x.isNullAt(4)) None else Some(x.getDouble(4))))).toMap
    assert(r.keySet == Set(1L, 2L, 3L, 4L, 5L), s"every query must report: $r")
    assert(r(1L) == ((2L, 1L, 0L, Some(1.0))))
    assert(r(2L) == ((2L, 0L, 1L, Some(-1.0))))
    assert(r(3L) == ((3L, 2L, 1L, Some(0.333333))))
    assert(r(4L) == ((0L, 0L, 0L, None)), "no common candidates -> NULL tau")
    assert(r(5L) == ((0L, 0L, 0L, None)))
  }
}
