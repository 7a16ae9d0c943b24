package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, TextAnalysis}

class TextAnalysisSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  test("clean text: lowercase, email redaction, strip, collapse") {
    val df = Seq((1L, "Contact Bob.Smith+x@Example.COM!!  Or   call; NOW.")).toDF("doc_id", "text")
    val r = TextAnalysis.withCleanText(df).select("clean_text").head.getString(0)
    assert(r == "contact <email> or call now")
  }

  test("token stats: counts, avg length, stopword ratio") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val r = TextAnalysis.withTextStats(df)
      .select("n_tokens", "avg_token_len", "stopword_ratio", "bpe_token_estimate").head
    assert(r.getInt(0) == 6)
    assert(math.abs(r.getDouble(1) - 17.0 / 6) < 1e-12) // 17 letters / 6 tokens
    assert(math.abs(r.getDouble(2) - 2.0 / 6) < 1e-12) // "the" twice
    assert(r.getLong(3) == math.ceil(22 / 4.0).toLong)
  }

  test("language id scores German keywords over English") {
    val df = Seq(
      (1L, "der hund und die katze und der vogel"),
      (2L, "the dog and a cat of the house")).toDF("doc_id", "text")
    val r = TextAnalysis.withLanguageId(df)
      .select("doc_id", "predicted_lang").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) == "de")
    assert(r(2L) == "en")
  }

  test("multimodal decode stub agrees with the expression path") {
    val docs = Seq((1L, "hello world", "s1"), (2L, "abcdefgh", "s2"))
      .toDF("doc_id", "text", "source")
    val viaExpr = Multimodal.withMediaMeta(docs)
      .select("doc_id", "n_bytes", "width", "height", "n_frames").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    val viaStub = Multimodal.decodeStub(Multimodal.toMediaRows(docs)).collect()
      .map(f => f.doc_id -> ((f.n_bytes, f.width, f.height, f.n_frames))).toMap
    assert(viaExpr == viaStub)
    val cs = Multimodal.decodeStub(Multimodal.toMediaRows(docs)).collect()
      .map(f => f.doc_id -> f.checksum).toMap
    assert(cs(1L) != cs(2L)) // payload-dependent
  }
}
