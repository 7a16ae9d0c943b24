package graft

import java.sql.Timestamp

import scala.math.BigDecimal.RoundingMode

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, RangeJoin}
import graft.functions.expressions.ZOrder2

/** Randomized (seeded, deterministic) checks for the operators with the
  * trickiest edge spaces, compared against brute-force references.
  */
class PropertySpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  private val rng = new scala.util.Random(42)

  test("connected components: local union-find == distributed loop on random graphs") {
    for (_ <- 1 to 5) {
      val edges = List.fill(30) {
        val a = rng.nextInt(20).toLong; val b = rng.nextInt(20).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2)
      val df = edges.toDF("d1", "d2")
      def canon(r: org.apache.spark.sql.DataFrame) =
        r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getBoolean(3)))
          .sortBy(_._1).toSeq
      assert(canon(Dedup.connectedComponents(df)) ==
        canon(Dedup.connectedComponents(df, localEdgeThreshold = 0L)),
        s"divergence on edges $edges")
    }
  }

  test("range join matches the brute-force pair set on random events") {
    for (round <- 1 to 5) {
      val rows = List.tabulate(25) { i =>
        (1L + rng.nextInt(3), rng.nextInt(500).toLong, i.toLong)
      }
      val df = rows.map { case (k, t, id) => (k, new Timestamp(1704067200000L + t * 1000), id) }
        .toDF("user_id", "ts", "event_id")
      val got = RangeJoin.selfWithin(df, "user_id", "ts", "event_id", windowSec = 60)
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (for {
        a <- rows; b <- rows
        if a._1 == b._1 && a._3 < b._3 && math.abs(a._2 - b._2) <= 60
      } yield (a._3, b._3)).toSet
      assert(got == expected, s"round $round: $rows")
    }
  }

  test("sequence packing: offsets are contiguous and budget-consistent per source") {
    import org.apache.spark.sql.functions._
    for (round <- 1 to 3) {
      val docs = List.tabulate(30) { i =>
        val words = List.fill(1 + rng.nextInt(12))("w" + rng.nextInt(5)).mkString(" ")
        (i.toLong, words, "src" + (i % 3))
      }.map { case (id, text, src) => (id, text, src) }
      val df = docs.toDF("doc_id", "text", "source")
      val packed = graft.operators.Corpus.packSequences(df, tokenBudget = 16)
        .orderBy("source", "doc_id")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      // per source: start offsets are the running sum (contiguous stream)
      packed.groupBy(_._1).foreach { case (_, rows) =>
        var expected = 0L
        rows.sortBy(_._2).foreach { case (_, _, n, start, seq, off) =>
          assert(start == expected)
          assert(seq == start / 16 && off == start % 16)
          expected += n
        }
      }
      assert(packed.map(_._3).sum == docs.map(_._2.split(" ").length).sum, s"round $round")
    }
  }

  test("global packing census equals the sequential single-stream reference") {
    for (round <- 1 to 3) {
      // sparse, shuffled-length docs so buckets are uneven and chunks
      // straddle bucket boundaries
      val docs = List.tabulate(40) { i =>
        val words = List.fill(1 + rng.nextInt(30))("w" + rng.nextInt(5)).mkString(" ")
        ((i * 7).toLong, words) // sparse ids → uneven doc_id-range buckets
      }
      val df = docs.toDF("doc_id", "text")
      val cap = 64L
      val got = graft.operators.Corpus
        .globalPackingCensus(df, capacity = cap, bucketSize = 50L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // sequential reference: one global stream in doc_id order
      var off = 0L
      val ref = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
      docs.sortBy(_._1).foreach { case (_, text) =>
        val dl = text.split(" ").length.toLong
        val chunk = off / cap
        val crossing = if ((off + dl - 1) / cap > chunk) 1L else 0L
        val (a, b, c) = ref.getOrElse(chunk, (0L, 0L, 0L))
        ref(chunk) = (a + 1, b + dl, c + crossing)
        off += dl
      }
      assert(got.toSeq == ref.toSeq.sortBy(_._1)
        .map { case (k, (a, b, c)) => (k, a, b, c) }, s"round $round")
      assert(got.map(_._3).sum == docs.map(_._2.split(" ").length).sum)
    }
  }

  test("int8 quantization round-trips within one scale step") {
    import org.apache.spark.sql.functions._
    val vecs = List.tabulate(20) { i =>
      (i.toLong, Array.fill(8)((rng.nextFloat() - 0.5f) * 10f))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.quantizeInt8(df).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    vecs.foreach { case (id, v) =>
      val scale = v.map(math.abs).max.toDouble
      val q = v.map(x => math.floor(x / scale * 127 + 0.5).toLong)
      assert(got(id) == ((scale, q.sum)), s"vec $id")
      // every quantized value is representable in int8 range
      assert(q.forall(x => x >= -128 && x <= 127))
    }
  }

  test("morton interleave is injective (bit-exact decode) on random 32-bit pairs") {
    def compact(x: Long): Long = {
      var v = x & 0x5555555555555555L
      v = (v | (v >> 1)) & 0x3333333333333333L
      v = (v | (v >> 2)) & 0x0f0f0f0f0f0f0f0fL
      v = (v | (v >> 4)) & 0x00ff00ff00ff00ffL
      v = (v | (v >> 8)) & 0x0000ffff0000ffffL
      (v | (v >> 16)) & 0xffffffffL
    }
    for (_ <- 1 to 1000) {
      val a = rng.nextLong() & 0xffffffffL
      val b = rng.nextLong() & 0xffffffffL
      val z = ZOrder2.morton(a, b)
      assert(compact(z) == a && compact(z >> 1) == b, s"decode failed for ($a, $b)")
    }
  }

  test("duplicate spans match a brute-force reference on random corpora") {
    val vocab = Array("aa", "bb", "cc", "dd")
    val L = graft.operators.Dedup.SpanGramLen
    for (round <- 1 to 4) {
      val docs = (0L until 6L).map { id =>
        (id, List.fill(12 + rng.nextInt(10))(vocab(rng.nextInt(vocab.length))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val got = graft.operators.Dedup.duplicateSpans(df)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
      // brute force: positions whose L-gram occurs in another doc, then
      // greedy island merge at distance <= L
      val grams = docs.flatMap { case (id, text) =>
        val w = text.split(" ")
        (0 to w.length - L).map(p => (id, p + 1, w.slice(p, p + L).mkString(" ")))
      }
      val byGram = grams.groupBy(_._3).view.mapValues(_.map(_._1).toSet).toMap
      val hits = grams.filter { case (id, _, g) => (byGram(g) - id).nonEmpty }
      val expected = hits.groupBy(_._1).flatMap { case (id, ps) =>
        val sorted = ps.map(_._2).sorted
        val islands = sorted.foldLeft(List.empty[List[Int]]) {
          case (Nil, p) => List(List(p))
          case (cur :: done, p) if p <= cur.head + L => (p :: cur) :: done
          case (acc, p) => List(p) :: acc
        }
        islands.map(is => (id, is.min, is.max + L - 1, is.size.toLong))
      }.toSet
      assert(got == expected, s"round $round: $docs")
    }
  }

  test("CMS estimate >= exact count on random streams, any partitioning") {
    import org.apache.spark.sql.functions._
    import graft.functions.Sketch
    for (round <- 1 to 3) {
      val rows = List.fill(2000)(s"k${rng.nextInt(300)}")
      val df = rows.toDF("w").repartition(1 + rng.nextInt(8))
      val cms = df.agg(Sketch.cmsMd5(col("w")).as("cms"))
      val est = df.distinct().crossJoin(broadcast(cms))
        .select(col("w"), Sketch.cmsEstimate(col("cms"), col("w")).as("e"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      exact.foreach { case (k, c) =>
        assert(est(k) >= c, s"round $round: $k est ${est(k)} < exact $c")
      }
    }
  }

  test("CMS join-size estimate >= exact join size on random sides, any partitioning") {
    import org.apache.spark.sql.functions._
    import graft.functions.Sketch
    for (round <- 1 to 3) {
      val left = List.fill(1500)(s"k${rng.nextInt(200)}")
      val right = List.fill(800)(s"k${rng.nextInt(350)}") // partial key overlap
      val a = left.toDF("k").repartition(1 + rng.nextInt(8))
      val b = right.toDF("k").repartition(1 + rng.nextInt(8))
      val est = a.agg(Sketch.cmsMd5(col("k")).as("ca"))
        .crossJoin(b.agg(Sketch.cmsMd5(col("k")).as("cb")))
        .select(Sketch.cmsJoinSize(col("ca"), col("cb")).as("e"))
        .head().getLong(0)
      val fa = left.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val fb = right.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val exact = fa.map { case (k, c) => c * fb.getOrElse(k, 0L) }.sum
      assert(est >= exact, s"round $round: est $est < exact $exact")
      // and the estimate is the join size's order of magnitude, not the
      // cross product's (the sketch prices the join, it doesn't give up)
      assert(est < left.size.toLong * right.size, s"round $round: est $est degenerate")
    }
  }

  test("histogram quantile is within one bin width of the rank-t order statistic") {
    // The GUARANTEED bound: the estimate lives in the bin that contains
    // the value at target rank t = ceil(p*n), so |est - v_t| <= width.
    // (vs percentile_cont the error additionally carries the local
    // inter-rank gap — unbounded on sparse tails by construction.)
    import graft.operators.Robust
    val width = (Robust.HistHi - Robust.HistLo) / Robust.HistBins
    for (round <- 1 to 3) {
      val rows = List.fill(1500)(("g" + rng.nextInt(3), rng.nextDouble() * 590.0))
      val df = rows.toDF("g", "v")
      val est = Robust.histQuantile(df, "g", "v").collect()
        .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
      rows.groupBy(_._1).foreach { case (g, members) =>
        val sorted = members.map(_._2).sorted
        def rankStat(p: Double) = sorted(math.ceil(p * sorted.length).toInt - 1)
        assert(math.abs(est(g)._1 - rankStat(0.5)) <= width, s"round $round $g p50")
        assert(math.abs(est(g)._2 - rankStat(0.95)) <= width, s"round $round $g p95")
      }
    }
  }

  test("edit-distance pairs match a brute-force reference on random cold-block corpora") {
    // every block under the cap → the contract reduces to plain blocked
    // Levenshtein; the operator must agree with a driver-side reference
    // pair-for-pair, distance-for-distance
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rng = new scala.util.Random(11)
    val vocab = Array("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    for (round <- 1 to 3) {
      val docs = (1 to 60).map { i =>
        val opener = s"${vocab(rng.nextInt(3))} ${vocab(rng.nextInt(3))}"
        val tail = Seq.fill(3 + rng.nextInt(5))(vocab(rng.nextInt(vocab.length))).mkString(" ")
        (i.toLong, s"$opener $tail")
      }
      val expected = (for {
        (i1, t1) <- docs; (i2, t2) <- docs
        if i1 < i2
        if t1.split(" ").take(2).mkString(" ") == t2.split(" ").take(2).mkString(" ")
        d = lev(t1.take(60), t2.take(60))
        if d <= 25
      } yield (i1, i2, d)).toSet
      val got = Dedup.editDistancePairs(docs.toDF("doc_id", "text")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      // 3x3 opener space over 60 docs: confirm blocks stayed cold so the
      // reference above is the full contract
      val blockSizes = docs.groupBy(_._2.split(" ").take(2).mkString(" ")).map(_._2.size)
      assert(blockSizes.max <= Dedup.EditBlockCap, "fixture accidentally built a hot block")
      assert(got == expected, s"round $round: ${(got diff expected, expected diff got)}")
      assert(expected.nonEmpty)
    }
  }

  test("bucketed near-dup pairs match brute force under cold blocks on random vectors") {
    import graft.operators.Similarity
    val rng = new scala.util.Random(23)
    val vecs = (1 to 80).map { i =>
      (i.toLong, Array.fill(64)((rng.nextDouble() * 2 - 1).toFloat), s"L${i % 3}")
    }
    val df = vecs.toDF("vec_id", "embedding", "label")
    // driver-side reference: same label AND same sign-LSH bucket AND
    // rounded cosine over threshold (blocks of ~80/96 stay far under cap)
    def bucket(v: Array[Float]): Long =
      (0 until Similarity.LshPlanes).map { h =>
        val dot = (1 to Similarity.Dim).map(d => Similarity.planeCoef(h, d) * v(d - 1)).sum
        if (dot >= 0) 1L << h else 0L
      }.sum
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val t = 0.05
    val expected = (for {
      (i1, v1, l1) <- vecs; (i2, v2, l2) <- vecs
      if i1 < i2 && l1 == l2 && bucket(v1) == bucket(v2)
      c = BigDecimal(cos(v1, v2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if c >= t
    } yield (i1, i2)).toSet
    val got = Similarity.bucketedNearDupPairs(df, t).select("v1", "v2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"${(got diff expected, expected diff got)}")
    assert(expected.nonEmpty)
  }

  test("ivfSweep per budget is row-identical to an independent ivfTopK run") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.col
    val rng = new scala.util.Random(31)
    val vecs = (0 until 120).map { i =>
      (i.toLong, Array.fill(64)((rng.nextDouble() * 2 - 1).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val probes = Seq(1, 2, 4)
    val sweep = Similarity.ivfSweep(df, col("vec_id") < 5, k = 3, probes)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getInt(5)))
      .groupBy(_._1)
    probes.foreach { p =>
      val solo = Similarity.ivfTopK(df, col("vec_id") < 5, k = 3, probes = p)
        .collect()
        .map(r => (p, r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getInt(4))).toSet
      assert(sweep(p).toSet == solo,
        s"probe $p: ${(sweep(p).toSet diff solo, solo diff sweep(p).toSet)}")
      assert(solo.nonEmpty)
    }
  }

  test("interval-overlap join matches brute force on random interval sets") {
    import graft.operators.RangeJoin
    for (round <- 1 to 4) {
      val rows = List.tabulate(40) { i =>
        val s = rng.nextInt(500).toLong
        (1L + rng.nextInt(3), s, s + 1 + rng.nextInt(200), i.toLong)
      }
      val df = rows.toDF("k", "s", "e", "id")
      val gotRows = RangeJoin.intervalOverlapSelf(df, "k", "s", "e", "id", gridSec = 60)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      val got = gotRows.toSet
      val exp = (for {
        a <- rows; b <- rows
        if a._1 == b._1 && a._4 < b._4 && a._2 < b._3 && b._2 < a._3
      } yield (a._1, a._4, b._4, math.min(a._3, b._3) - math.max(a._2, b._2))).toSet
      assert(got == exp, s"round $round")
      // the later-start bucket-ownership rule emits each pair EXACTLY once
      assert(gotRows.size == got.size, s"round $round: duplicate pair emissions")
    }
    // end-exclusive: touching intervals never pair
    val touch = Seq((1L, 0L, 10L, 1L), (1L, 10L, 20L, 2L)).toDF("k", "s", "e", "id")
    assert(RangeJoin.intervalOverlapSelf(touch, "k", "s", "e", "id", 60).count() == 0)
  }

  test("sweep-line concurrency matches brute-force pair statistics on random intervals") {
    import graft.operators.RangeJoin
    for (round <- 1 to 4) {
      val rows = List.tabulate(50) { i =>
        val s = rng.nextInt(500).toLong
        (1L + rng.nextInt(3), s, s + 1 + rng.nextInt(200), i.toLong)
      }
      val df = rows.toDF("k", "s", "e", "id").repartition(1 + rng.nextInt(5))
      val got = RangeJoin.intervalConcurrency(df, "k", "s", "e", "id", gridSec = 60)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      rows.groupBy(_._1).foreach { case (k, ivs) =>
        val pairs = for {
          a <- ivs; b <- ivs
          if a._4 < b._4 && a._2 < b._3 && b._2 < a._3
        } yield math.min(a._3, b._3) - math.max(a._2, b._2)
        val peak = (0L until 800L).map(t => ivs.count(iv => iv._2 <= t && t < iv._3)).max
        val (gp, gov, gpk) = got(k)
        assert(gp == pairs.size, s"round $round k=$k pairs: $gp vs ${pairs.size}")
        assert(gov == pairs.sum, s"round $round k=$k overlap: $gov vs ${pairs.sum}")
        assert(gpk == peak, s"round $round k=$k peak: $gpk vs $peak")
      }
    }
  }

  test("KMV sketch == exact bottom-k under any duplication/partitioning; estimate bounded") {
    import org.apache.spark.sql.functions._
    import graft.functions.{Hashes, Sketch}
    for (round <- 1 to 4) {
      val card = 200 + rng.nextInt(3000)
      val rows = List.fill(6000)(s"r$round-v${rng.nextInt(card)}")
      val k = 128
      val df = rows.toDF("t").repartition(1 + rng.nextInt(9))
      val sk = df.agg(Sketch.kmvMd5(col("t"), k).as("sk")).head.getSeq[Long](0)
      val exact = rows.distinct.toDF("t")
        .select(Hashes.md5Long60(col("t")).as("h"))
        .orderBy("h").limit(k).as[Long].collect().toSeq
      assert(sk == exact, s"round $round: sketch != exact bottom-$k")
      val est = df.agg(Sketch.kmvMd5(col("t"), k).as("sk"))
        .select(Sketch.kmvEstimate(col("sk"), k)).head.getDouble(0)
      val distinct = rows.distinct.size
      // k=128 → se ~ 1/sqrt(126) ≈ 8.9%; allow 5 sigma for the property loop
      assert(math.abs(est - distinct) / distinct < 0.45, s"round $round: est $est vs $distinct")
    }
  }

  test("distributed AUC == brute-force pair statistic on random scored frames") {
    import org.apache.spark.sql.functions._
    for (round <- 1 to 4) {
      val rows = List.tabulate(300) { i =>
        (i.toLong, rng.nextInt(2), math.rint(rng.nextDouble() * 20) / 20.0) // heavy ties
      }
      val df = rows.toDF("doc_id", "label", "score").repartition(1 + rng.nextInt(7))
      val r = graft.operators.Classifier.auc(df).head
      val pos = rows.filter(_._2 == 1).map(_._3)
      val neg = rows.filter(_._2 == 0).map(_._3)
      val wins = (for (p <- pos; n <- neg)
        yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
      val expected = math.rint(wins / (pos.size.toLong * neg.size) * 1e6) / 1e6
      assert(r.getAs[Double]("auc") == expected, s"round $round")
    }
  }

  test("distributed exact percentiles == builtin percentile on random frames") {
    import org.apache.spark.sql.functions._
    for (round <- 1 to 4) {
      val rows = List.tabulate(400) { i =>
        (s"k${i % 3}", math.rint(rng.nextDouble() * 100) / 4.0) // value ties
      }
      val df = rows.toDF("k", "v").repartition(1 + rng.nextInt(7))
      val ps = Seq(0.1, 0.5, 0.9)
      val got = graft.operators.Robust.exactPercentiles(df, "k", "v", ps)
        .collect().map(x => (x.getString(0), x.getDouble(1)) -> x.getAs[Double]("value")).toMap
      val exp = df.groupBy("k")
        .agg(percentile(col("v"), lit(0.1)), percentile(col("v"), lit(0.5)),
          percentile(col("v"), lit(0.9)))
        .collect().flatMap(x => ps.zipWithIndex.map { case (p, i) =>
          (x.getString(0), p) -> math.rint(x.getDouble(i + 1) * 1e6) / 1e6 }).toMap
      assert(got.keySet == exp.keySet)
      got.foreach { case (kp, v) =>
        assert(math.abs(v - exp(kp)) < 1e-9, s"round $round $kp: $v vs ${exp(kp)}") }
    }
  }

  test("log quantile sketch: relative-error bound holds at every magnitude, any partitioning") {
    import org.apache.spark.sql.functions._
    val bound = 1.0 / (1L << (graft.operators.Robust.LogSubBits + 1)) + 1e-12
    for (round <- 1 to 4) {
      // magnitudes spanning 1 .. ~1e12 — the domain the fixed-range sketch cannot cover
      val rows = List.tabulate(300) { i =>
        val mag = math.pow(10, rng.nextInt(12)).toLong
        (s"k${i % 3}", 1L + (math.abs(rng.nextLong()) % math.max(1L, mag * 9)))
      }
      val df = rows.toDF("k", "v").repartition(1 + rng.nextInt(7))
      val ps = Seq(0.5, 0.9, 0.99)
      val est = graft.operators.Robust.logQuantile(df, "k", "v", ps)
        .collect().map(x => x.getString(0) ->
          (x.getAs[Long]("est_p50"), x.getAs[Long]("est_p90"), x.getAs[Long]("est_p99"))).toMap
      // exact order statistic at rank ceil(p*n), per group, brute force
      val byK = rows.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
      byK.foreach { case (k, sorted) =>
        val (e50, e90, e99) = est(k)
        ps.zip(Seq(e50, e90, e99)).foreach { case (p, e) =>
          val target = sorted(math.ceil(p * sorted.size).toInt - 1)
          val rel = math.abs(e - target).toDouble / target
          assert(rel <= bound, s"round $round $k p$p: est $e vs $target (rel $rel)")
        }
      }
      // partition invariance: sketch output is identical under any layout
      val a = graft.operators.Robust.logQuantile(df.repartition(1), "k", "v", ps)
        .orderBy("k").collect().toSeq
      val b = graft.operators.Robust.logQuantile(df.repartition(8), "k", "v", ps)
        .orderBy("k").collect().toSeq
      assert(a == b, s"round $round: partitioning changed the sketch output")
    }
  }

  test("skyline matches the brute-force dominance filter on random point sets") {
    for (round <- 1 to 5) {
      // mix of correlated, anti-correlated (worst case: all on frontier),
      // and duplicated points across wide x magnitudes
      val pts = List.tabulate(120) { i =>
        val x = 1L + (math.abs(rng.nextLong()) % (if (i % 2 == 0) 1000L else 1000000L))
        val y = if (round % 2 == 0) -x + rng.nextInt(50) else rng.nextInt(1000) - 500
        (i.toLong, x, y.toDouble)
      } ++ List((900L, 77L, 3.0), (901L, 77L, 3.0)) // exact duplicates: both kept
      val df = pts.toDF("id", "x", "y").repartition(1 + rng.nextInt(6))
      val got = graft.operators.Skyline.skyline2(df, "id", "x", "y")
        .collect().map(_.getLong(0)).toSet
      val exp = pts.filter { case (_, x, y) =>
        !pts.exists { case (_, ox, oy) => ox >= x && oy >= y && (ox > x || oy > y) }
      }.map(_._1).toSet
      assert(got == exp, s"round $round: got ${got.size} vs expected ${exp.size}")
    }
  }

  test("kendall tau-b == brute-force pair statistic on random rankings; symmetric; self-tau 1") {
    import graft.operators.Similarity
    for (round <- 1 to 5) {
      // two random permutations of a shared candidate pool per query,
      // truncated to different lengths so the common set varies
      val qs = (1L to 4L)
      val rowsA = qs.flatMap { q =>
        val perm = rng.shuffle((10 to 25).toList).take(10 + rng.nextInt(6))
        perm.zipWithIndex.map { case (c, i) => (q, c.toLong, i + 1) }
      }
      val rowsB = qs.flatMap { q =>
        val perm = rng.shuffle((10 to 25).toList).take(10 + rng.nextInt(6))
        perm.zipWithIndex.map { case (c, i) => (q, c.toLong, i + 1) }
      }
      val a = rowsA.toDF("query_id", "cand_id", "rank_a")
      val b = rowsB.toDF("query_id", "cand_id", "rank_b")
      def collectTau(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
      val got = collectTau(Similarity.kendallTauB(a, b))
      // brute force per query
      val aM = rowsA.groupBy(_._1).map { case (q, rs) => q -> rs.map(r => r._2 -> r._3).toMap }
      val bM = rowsB.groupBy(_._1).map { case (q, rs) => q -> rs.map(r => r._2 -> r._3).toMap }
      qs.foreach { q =>
        val common = (aM(q).keySet & bM(q).keySet).toSeq.sorted
        val pairsList = for { i <- common.indices; j <- i + 1 until common.size } yield (common(i), common(j))
        val c = pairsList.count { case (x, y) =>
          (aM(q)(x) - aM(q)(y)).toLong * (bM(q)(x) - bM(q)(y)) > 0 }
        val d = pairsList.size - c
        val n = common.size
        val exp = if (n < 2) None
          else Some(BigDecimal((c - d).toDouble / (n.toLong * (n - 1) / 2).toDouble)
            .setScale(6, RoundingMode.HALF_UP).toDouble)
        assert(got(q) == ((n.toLong, c.toLong, d.toLong, exp)), s"round $round q$q: ${got(q)}")
      }
      // symmetry: tau(a,b) == tau(b,a)
      val sym = collectTau(Similarity.kendallTauB(
        b.withColumnRenamed("rank_b", "rank_a"), a.withColumnRenamed("rank_a", "rank_b")))
      assert(got == sym, s"round $round: tau not symmetric")
      // self-agreement: tau(a,a) == 1 for every query with >= 2 candidates
      val self = collectTau(Similarity.kendallTauB(
        a, a.withColumnRenamed("rank_a", "rank_b")))
      self.values.foreach { case (n, _, dis, t) =>
        if (n >= 2) { assert(t.contains(1.0)); assert(dis == 0L) }
      }
    }
  }

  test("label-noise audit == brute-force neighborhood stats on random labeled graphs") {
    import graft.operators.Graph
    for (round <- 1 to 5) {
      val nodes = (0L until 15L).map(i => i -> rng.nextInt(3)).toMap
      val edges = List.fill(30) {
        val x = rng.nextInt(15).toLong; val y = rng.nextInt(15).toLong
        (math.min(x, y), math.max(x, y))
      }.filter(e => e._1 != e._2).distinct
      val pairs = edges.toDF("v1", "v2")
      val labels = nodes.toSeq.toDF("id", "label")
      val got = Graph.labelNoiseAudit(pairs, labels).collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getInt(5), r.getBoolean(6)))).toMap
      val adj = (edges ++ edges.map(e => (e._2, e._1)))
        .groupBy(_._1).map { case (k, es) => k -> es.map(_._2) }
      adj.foreach { case (id, nbs) =>
        val own = nodes(id)
        val nd = nbs.count(n => nodes(n) != own).toLong
        val rate = BigDecimal(nd.toDouble / nbs.size)
          .setScale(6, RoundingMode.HALF_UP).toDouble
        val maj = nbs.groupBy(nodes).map { case (l, xs) => (l, xs.size) }
          .toSeq.sortBy { case (l, c) => (-c, l) }.head._1
        val suspect = rate >= 0.5 && maj != own
        assert(got(id) == ((own, nbs.size.toLong, nd, rate, maj, suspect)),
          s"round $round node $id: ${got(id)}")
      }
      assert(got.keySet == adj.keySet, "exactly the nodes with neighbors report")
    }
  }
}
