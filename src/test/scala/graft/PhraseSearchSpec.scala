package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

class PhraseSearchSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  test("positional join finds phrases at doc start, end, repeated, and never across docs") {
    val docs = Seq(
      1L -> "hash join opens the doc", // at start
      2L -> "ends with a hash join", // at end
      3L -> "hash join twice hash join", // two occurrences
      4L -> "hash alone then join apart", // words present, not adjacent
      5L -> "join hash", // reversed order is no match
      6L -> "hash") // doc ends where the phrase would continue
      .toDF("doc_id", "text")
    val r = TextAnalysis.phraseSearch(docs, Seq("hash join"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq(("hash join", 3L, 4L))) // docs 1,2,3; occurrences 1+1+2
  }

  test("phrases with zero hits are absent, not zero rows") {
    val docs = Seq(1L -> "nothing relevant here").toDF("doc_id", "text")
    assert(TextAnalysis.phraseSearch(docs, Seq("hash join")).count() == 0)
  }
}
