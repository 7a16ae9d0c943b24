package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Classifier

/** In-engine logistic-regression trainer: feature extraction, exact
  * partitioning invariance of the GD trajectory, and that training on a
  * separable corpus actually separates it. Cross-engine bit-exactness of
  * the full trajectory is hash-checked by q171's DuckDB oracle.
  */
class ClassifierSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  // src0 docs: long, stopword-rich. other docs: short, stopword-free.
  private def corpus = {
    val pos = (0 until 30).map { i =>
      (i.toLong, ("the data of a pipeline and more words here now " * 6).trim, "src0")
    }
    val neg = (30 until 60).map { i =>
      (i.toLong, s"short doc number$i", s"src${i % 4 + 1}")
    }
    (pos ++ neg).toDF("doc_id", "text", "source")
  }

  test("features: capped signals and the binary label") {
    val df = Seq((1L, "the cat of the house sat", "src0"),
      (2L, "tiny", "src9")).toDF("doc_id", "text", "source")
    val f = Classifier.features(df, col("source") === "src0").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // doc 1: 6 tokens → x1 = 6/200; avg len (24-5)/6 / 8; stopwords 3/6 * 2 = 1.0 (capped)
    assert(math.abs(f(1L)._1 - 6.0 / 200) < 1e-12)
    assert(math.abs(f(1L)._2 - (19.0 / 6) / 8) < 1e-12)
    assert(f(1L)._3 == 1.0)
    assert(f(1L)._4 == 1.0)
    // doc 2: 1 token, no stopwords, negative label
    assert(f(2L)._3 == 0.0 && f(2L)._4 == 0.0)
  }

  test("linear shap: attributions reconstruct z and name the dominant feature") {
    val label = col("source") === "src0"
    val sh = Classifier.shapAttributions(corpus, label).collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getString(5))))
      .toMap
    val w = Classifier.trainedWeights(corpus, label)
    val f = Classifier.features(corpus, label).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    sh.foreach { case (id, (p1, p2, p3, base, top)) =>
      // efficiency: base + Σφ = z(doc), up to the 6-dp rounding of 4 terms
      val z = w(0) + w(1) * f(id)._1 + w(2) * f(id)._2 + w(3) * f(id)._3
      assert(math.abs(base + p1 + p2 + p3 - z) < 2e-6, s"doc $id")
      val phis = Seq("x1" -> p1, "x2" -> p2, "x3" -> p3)
      assert(math.abs(phis.toMap.apply(top)) == phis.map(x => math.abs(x._2)).max)
    }
    assert(sh.size == 60)
  }

  test("calibration bins partition the corpus; psi is exactly zero for identical cohorts") {
    val label = col("source") === "src0"
    val cal = Classifier.calibrationCurve(corpus, label).collect()
    assert(cal.map(_.getLong(1)).sum == 60)
    assert(cal.forall(r => r.getDouble(4) >= 0.0)) // ECE contributions
    // duplicate every doc under offset ids: the two cohorts have
    // IDENTICAL score distributions, so every PSI contribution is 0
    val doubled = corpus.unionByName(
      corpus.withColumn("doc_id", col("doc_id") + 1000L))
    val psi = Classifier.psiDrift(doubled, label, col("doc_id") < 1000L).collect()
    assert(psi.nonEmpty)
    psi.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), "cohort counts differ")
      assert(r.getDouble(5) == 0.0, s"bin ${r.getInt(0)} psi ${r.getDouble(5)}")
    }
  }

  test("GD trajectory is exactly partitioning-invariant") {
    val a = Classifier.trainDomainClassifier(corpus, col("source") === "src0").head
    val b = Classifier.trainDomainClassifier(corpus.repartition(7), col("source") === "src0").head
    assert(a == b)
  }

  test("hash-sampled training still separates and stays partitioning-invariant") {
    val a = Classifier.trainDomainClassifier(corpus, col("source") === "src0", trainPct = 50).head
    val b = Classifier.trainDomainClassifier(
      corpus.repartition(5), col("source") === "src0", trainPct = 50).head
    assert(a == b)
    // evaluation still covers ALL docs even though GD saw only the sample
    assert(a.getAs[Long]("n_docs") == 60)
    assert(a.getAs[Double]("accuracy") > 0.9)
    // the sampled trajectory differs from the full one (it really did subsample)
    val full = Classifier.trainDomainClassifier(corpus, col("source") === "src0").head
    assert(a.getAs[Double]("w1") != full.getAs[Double]("w1"))
  }

  test("training separates a separable corpus and reports coherent counts") {
    val r = Classifier.trainDomainClassifier(corpus, col("source") === "src0").head
    val (nDocs, nPos) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_pos"))
    val (tp, fp, tn, fn) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("tn"), r.getAs[Long]("fn"))
    assert(nDocs == 60 && nPos == 30)
    assert(tp + fn == nPos && fp + tn == nDocs - nPos)
    assert(r.getAs[Double]("accuracy") == (tp + tn).toDouble / nDocs)
    // separable by x1/x3 with a wide margin: GD should beat the 0.5 baseline
    assert(r.getAs[Double]("accuracy") > 0.9,
      s"accuracy ${r.getAs[Double]("accuracy")} too low for a separable corpus")
    // the long/stopword-rich class gets the positive weights
    assert(r.getAs[Double]("w1") > 0 && r.getAs[Double]("w3") > 0)
  }

  test("exact AUC matches the brute-force pair statistic, ties included") {
    import spark.implicits._
    // hand-built scored frame with tie groups straddling values
    val scored = Seq(
      (1L, 1, 0.90), (2L, 1, 0.80), (3L, 1, 0.80), (4L, 1, 0.30),
      (5L, 0, 0.80), (6L, 0, 0.50), (7L, 0, 0.30), (8L, 0, 0.10), (9L, 0, 0.10)
    ).toDF("doc_id", "label", "score")
    val r = Classifier.auc(scored).head
    // brute force: P(s_pos > s_neg) + 0.5 P(=) over all 4*5 pairs
    val rows = Seq((1, 0.90), (1, 0.80), (1, 0.80), (1, 0.30),
      (0, 0.80), (0, 0.50), (0, 0.30), (0, 0.10), (0, 0.10))
    val pos = rows.filter(_._1 == 1).map(_._2)
    val neg = rows.filter(_._1 == 0).map(_._2)
    val wins = (for (p <- pos; n <- neg) yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val expected = math.rint(wins / (pos.size * neg.size) * 1e6) / 1e6
    assert(r.getAs[Long]("n_pos") == 4 && r.getAs[Long]("n_neg") == 5)
    assert(r.getAs[Long]("n_score_groups") == 5)
    assert(r.getAs[Double]("auc") == expected, s"auc ${r.getAs[Double]("auc")} != $expected")
    // partition-order-proof (the two-level cumulative is exact integers)
    assert(Classifier.auc(scored.repartition(7)).head == r)
    // a perfect separator scores 1.0 regardless of bucket boundaries
    val perfect = (1 to 40).map(i => (i.toLong, if (i <= 20) 1 else 0,
      if (i <= 20) 0.5 + i / 100.0 else i / 100.0)).toSeq.toDF("doc_id", "label", "score")
    assert(Classifier.auc(perfect).head.getAs[Double]("auc") == 1.0)
  }

  test("keyed AUC groups independently and drops single-class strata") {
    import spark.implicits._
    val scored = Seq(
      // stratum "g": same rows as the global test → same AUC
      ("g", 1, 0.90), ("g", 1, 0.80), ("g", 1, 0.30),
      ("g", 0, 0.80), ("g", 0, 0.50), ("g", 0, 0.10),
      // stratum "perfect": separable → 1.0
      ("p", 1, 0.9), ("p", 1, 0.8), ("p", 0, 0.2), ("p", 0, 0.1),
      // stratum "onlypos": single class → must drop
      ("o", 1, 0.7), ("o", 1, 0.6)
    ).toDF("k", "label", "score")
    val r = Classifier.aucBy(scored, "k")
      .collect().map(x => x.getString(0) -> x.getAs[Double]("auc")).toMap
    assert(r.keySet == Set("g", "p"))
    assert(r("p") == 1.0)
    // the "g" stratum's AUC equals the unkeyed computation on its rows
    val solo = Classifier.auc(scored.filter($"k" === "g").drop("k")).head.getAs[Double]("auc")
    assert(r("g") == solo)
  }
}
