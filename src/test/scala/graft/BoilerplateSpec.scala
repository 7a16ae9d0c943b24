package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Corpus, Multimodal}

class BoilerplateSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  test("shared chunks require >=2 DISTINCT docs; within-doc repeats do not count") {
    // small divisor so the tiny fixture produces several chunks per doc
    val div = 4
    val mkDoc = (words: Seq[String]) => words.mkString(" ")
    // docs 1 and 2 share a prefix long enough to contain whole shared
    // chunks; doc 3 repeats ITS OWN chunk content twice (same doc, so
    // the chunk is not "shared"); doc 4 is disjoint
    val common = (1 to 24).map(i => s"w$i")
    val docs = Seq(
      1L -> mkDoc(common ++ Seq("tail1", "a", "b")),
      2L -> mkDoc(common ++ Seq("tail2", "c", "d")),
      3L -> mkDoc((1 to 12).map(i => s"x$i") ++ (1 to 12).map(i => s"x$i")),
      4L -> mkDoc((1 to 20).map(i => s"z$i")))
      .toDF("doc_id", "text")
    val r = Corpus.boilerplateCensus(docs, divisor = div)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap

    // every word is accounted for exactly once across a doc's chunks
    assert(r(1L)._3 == 27 && r(4L)._3 == 20)
    // docs 1/2 share chunks; their shared word counts are equal over the
    // common prefix region and strictly positive
    assert(r(1L)._4 > 0 && r(2L)._4 > 0)
    // doc 4 shares nothing
    assert(r(4L)._2 == 0 && r(4L)._4 == 0)
    // doc 3's self-repeat: its repeated chunk appears only within doc 3,
    // so countDistinct(doc_id) == 1 and nothing is flagged shared
    assert(r(3L)._2 == 0 && r(3L)._4 == 0)
  }

  test("index matcher edges: empty index -> all novel; novel docs carry NULL hamming") {
    val long = (1 to 20).map(i => s"word$i").mkString(" ") // > DHashMinChars
    val newDocs = Seq(10L -> long, 11L -> (long + " extra")).toDF("doc_id", "text")
    val newH = Multimodal.withDhash(newDocs)
    val emptyIndex = Multimodal.withDhash(
      Seq.empty[(Long, String)].toDF("doc_id", "text"))
    val r = Multimodal.dhashIndexMatches(newH, emptyIndex).collect()
    assert(r.length == 2)
    assert(r.forall(x => x.getLong(1) == 0L && x.isNullAt(2) && x.isNullAt(3)))
  }
}
