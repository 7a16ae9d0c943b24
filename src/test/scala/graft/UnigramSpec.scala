package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Corpus

/** The unigram-LM tokenizer's contracts: lossless Viterbi segmentation,
  * partition-order determinism, true optimality under the trained piece
  * model (brute-force cross-check), and the hard-EM prune/keep rules.
  */
class UnigramSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  private val docs = Seq(
    (1L, "abab abab aabb ab ba baba abba"),
    (2L, "abab aabb abab cd cdcd ddd ccc"),
    (3L, "ab ba baba cdcd abab aabb abab")
  ).toDF("doc_id", "text")

  test("viterbi segmentation is lossless and partitioning-invariant") {
    val enc = Corpus.unigramEncodings(docs, vocabSize = 6, rounds = 8)
    val rows = enc.collect()
    assert(rows.nonEmpty)
    rows.foreach(r =>
      assert(r.getAs[String]("toks").replace(" ", "") == r.getAs[String]("w")))
    val again = Corpus.unigramEncodings(docs.repartition(5), vocabSize = 6, rounds = 8)
    assert(again.orderBy("w").collect().toSeq == enc.orderBy("w").collect().toSeq)
  }

  test("viterbi cost equals the brute-force optimum under the trained model") {
    val vocab = Corpus.unigramVocabReport(docs, vocabSize = 6, rounds = 8).collect()
    // exact trained costs, rebuilt from the EM usage counts (add-1)
    val cnt = vocab.map(r => r.getAs[String]("g") -> (r.getAs[Long]("used") + 1)).toMap
    val tot = cnt.values.sum
    val cost = cnt.map { case (g, c) => g -> -math.log(c.toDouble / tot.toDouble) }
    def bruteBest(w: String): Double = {
      val dp = Array.fill(w.length + 1)(Double.MaxValue)
      dp(0) = 0.0
      for (i <- 1 to w.length; l <- 1 to 4 if l <= i) {
        val piece = w.substring(i - l, i)
        if (cost.contains(piece) && dp(i - l) != Double.MaxValue) {
          val c = dp(i - l) + cost(piece)
          if (c < dp(i)) dp(i) = c
        }
      }
      dp(w.length)
    }
    Corpus.unigramEncodings(docs, vocabSize = 6, rounds = 8).collect().foreach { r =>
      val w = r.getAs[String]("w")
      assert(math.abs(r.getAs[Double]("cost") - bruteBest(w)) < 1e-9,
        s"word $w: engine ${r.getAs[Double]("cost")} vs brute ${bruteBest(w)}")
      // and the reported piece count matches the returned segmentation
      assert(r.getAs[Int]("n_toks") == r.getAs[String]("toks").split(" ").length)
    }
  }

  test("hard-EM prunes unused multi-char pieces and keeps every char") {
    val v = Corpus.unigramVocabReport(docs, vocabSize = 6, rounds = 8).collect()
    assert(v.filter(_.getAs[Int]("piece_len") > 1).forall(_.getAs[Long]("used") > 0),
      "a multi-char piece survived pruning with zero usage")
    val chars = v.filter(_.getAs[Int]("piece_len") == 1).map(_.getAs[String]("g")).toSet
    assert(Set("a", "b", "c", "d").subsetOf(chars))
    // scores are the -ln p of the add-1 counts, descending in usage
    val used = v.map(_.getAs[Long]("used"))
    assert(used.sorted.reverse.sameElements(used))
  }
}
