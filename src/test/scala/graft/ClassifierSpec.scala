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
}
