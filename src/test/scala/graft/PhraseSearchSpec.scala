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

  test("n-word phrases: 3/4-word matches, overlaps, and repeated-word phrases resolve exactly") {
    val docs = Seq(
      1L -> "sort merge join wins here", // 3-word at start
      2L -> "prefer a sort merge join plan", // 3-word mid-doc
      3L -> "sort merge join sort merge join", // two non-overlapping occurrences
      4L -> "sort merge then join later", // all words, broken adjacency
      5L -> "the the the the", // overlapping repeated-word hits: anchors 0,1
      6L -> "a b a b a", // "a b a" overlaps itself at anchors 0 and 2
      7L -> "one two three four five") // 4-word phrase source
      .toDF("doc_id", "text")
    val r = TextAnalysis.phraseSearch(docs,
      Seq("sort merge join", "the the the", "a b a", "one two three four"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSeq
    assert(r == Seq(
      ("a b a", 1L, 2L), // doc 6: anchors 0 and 2
      ("one two three four", 1L, 1L),
      ("sort merge join", 3L, 4L), // docs 1,2,3; occurrences 1+1+2
      ("the the the", 1L, 2L))) // doc 5: anchors 0 and 1
  }

  test("a partial suffix match at doc end never counts (all n votes required)") {
    val docs = Seq(1L -> "ends with sort merge").toDF("doc_id", "text")
    assert(TextAnalysis.phraseSearch(docs, Seq("sort merge join")).count() == 0)
  }

  test("minimal covering window finds the exact tightest span, any term order") {
    val docs = Seq(
      1L -> "a x x b", // cover [a..b] = 4 tokens
      2L -> "b a", // reversed: 2 tokens
      3L -> "a b a", // overlapping: [a,b] or [b,a] = 2
      4L -> "a x x x x x b x a b", // tightest is the trailing [a b] = 2, not the leading 7
      5L -> "a only") // missing b — excluded
      .toDF("doc_id", "text")
    val r = TextAnalysis.minWindowCover(
      TextAnalysis.positionalPostings(docs), Seq("a", "b"), topK = 10)
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getInt(2))).toSeq
    assert(r == Seq((1, 2L, 2), (2, 3L, 2), (3, 4L, 2), (4, 1L, 4)))
  }

  test("snippet slice is the earliest tightest window's exact tokens") {
    val docs = Seq(
      1L -> "x a y b x a b z", // tightest [a b] at pos 5..6; earliest-tightest wins
      2L -> "a b then more text") // window 2 at start
      .toDF("doc_id", "text")
    val r = TextAnalysis.minWindowSnippets(
      docs, TextAnalysis.positionalPostings(docs), Seq("a", "b"), topK = 5)
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getInt(2), x.getString(3))).toSeq
    assert(r == Seq((1, 1L, 2, "a b"), (2, 2L, 2, "a b")))
  }

  test("dirichlet QL ranks the doc with more query-term mass first") {
    val docs = Seq(
      1L -> "spark spark window filler filler",
      2L -> "spark filler filler filler filler",
      3L -> "no query terms at all")
      .toDF("doc_id", "text")
    val r = TextAnalysis.dirichletQL(
      TextAnalysis.positionalPostings(docs), Seq("spark", "window"))
      .collect().map(x => x.getLong(0)).toSeq
    assert(r == Seq(1L, 2L)) // doc 3 excluded (no hits), doc 1 beats doc 2
  }

  test("term proximity takes the per-doc MIN distance via merged-order adjacency") {
    val docs = Seq(
      1L -> "spark a b window", // dist 3
      2L -> "window spark", // dist 1, order-insensitive
      3L -> "spark x spark window", // nearest occurrence wins: dist 1, not 3
      4L -> "spark only here") // one side only — no row
      .toDF("doc_id", "text")
    val r = TextAnalysis.termProximity(
      TextAnalysis.positionalPostings(docs), Seq("spark", "window"))
      .collect().map(x =>
        (x.getString(0), x.getLong(1), x.getInt(2), x.getDouble(3))).toSeq
    // docs 1,2,3 qualify; best 1; mean of per-doc mins (3+1+1)/3
    assert(r == Seq(("spark|window", 3L, 1, 1.666667)))
  }
}
