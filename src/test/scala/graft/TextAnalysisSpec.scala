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

  test("repetition stats flag the degenerate doc and pass the diverse one") {
    val docs = Seq(
      (1L, "spam spam spam spam spam ham"), // one word dominates
      (2L, "the quick brown fox jumps over a lazy dog today"), // diverse
      (3L, "solo") // single word: bigram frac is NULL, not a crash
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(docs).collect()
      .map(x => x.getLong(0) ->
        ((x.getInt(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getBoolean(8)))).toMap
    // doc 1: 6 words, top word 5x, 2 distinct, top bigram "spam spam" 4x → fail
    assert(r(1L) == ((6, 5L, 2L, 4L, false)))
    // doc 2: 10 words all distinct → pass
    assert(r(2L) == ((10, 1L, 10L, 1L, true)))
    // doc 3: 1 word → bigram count 0, frac null, pass hinges on word frac
    assert(r(3L)._1 == 1 && !r(3L)._5) // top_word_frac 1.0 > 0.2 → fail
  }

  test("gopher rules: hand-computed flags per rule") {
    val pass = ("the cat and dog " * 15).trim // 60 words, meanLen 3.0, stopwords {the, and}
    val short = "tiny doc of words" // 4 words → word-count fail (stopword fail too: only "of")
    val symbols = (("the cat and dog " * 13).trim + " " + ("# " * 8).trim) // 60 words, 8 '#'
    val docs = Seq((1L, pass), (2L, short), (3L, symbols)).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    // doc 1: every rule passes; mean_word_len exactly (239-59)/60 = 3.0
    assert(r(1L).getAs[Int]("n_words") == 60)
    assert(r(1L).getAs[Double]("mean_word_len") == 3.0)
    assert(r(1L).getAs[Int]("n_stopwords_present") == 2)
    assert(r(1L).getAs[Boolean]("pass_gopher"))
    // doc 2: too short, and only one stopword present
    assert(!r(2L).getAs[Boolean]("pass_word_count"))
    assert(!r(2L).getAs[Boolean]("pass_stopwords"))
    assert(!r(2L).getAs[Boolean]("pass_gopher"))
    // doc 3: 8 '#' in 60 words → ratio 8/60 > 0.1 fails; alpha 52/60 > 0.8 passes
    assert(math.abs(r(3L).getAs[Double]("symbol_ratio") - 0.133333) < 1e-6)
    assert(!r(3L).getAs[Boolean]("pass_symbol_ratio"))
    assert(r(3L).getAs[Boolean]("pass_alpha_words"))
    assert(!r(3L).getAs[Boolean]("pass_gopher"))
  }

  test("scrub audit counts redacted emails and removed characters") {
    val docs = Seq(
      (1L, "mail a@b.com and c@d.org please", "s1", 31L),
      (2L, "no mail here!!", "s1", 14L)).toDF("doc_id", "text", "source", "n_chars")
    val r = graft.warehouse.PipelineQueries.scrubAuditOf(docs).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("docs_with_email") == 1L)
    assert(row.getAs[Long]("total_emails") == 2L)
    assert(row.getAs[Long]("n_docs") == 2L)
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

  test("blocklist filter: additive word+phrase tiers, hand-computed verdicts") {
    val d = Seq(
      (1L, "slow scan over a big table today"), // slow(1)+big(1) + slow scan(2)+big table(2) = 6 over 7 words
      (2L, "clean text with nothing blocked here"), // no hits
      (3L, "slow slow slow slow") // 4 hits of sev 1 = 4 over 4 words -> 100 per 100 -> fail
    ).toDF("doc_id", "text")
    val r = TextAnalysis.blocklistFilter(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_hits"), x.getAs[Long]("sev_sum"),
          x.getAs[Double]("block_score"), x.getAs[Boolean]("pass_blocklist")))).toMap
    assert(r(1L) == ((4L, 6L, BigDecimal(600.0 / 7).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, false)))
    assert(r(2L) == ((0L, 0L, 0.0, true)))
    assert(r(3L) == ((4L, 4L, 100.0, false)))
  }

  test("magic-number sniffing recovers every assigned modality; untagged falls back") {
    import org.apache.spark.sql.functions.col
    val d = (0L to 40L).map(i => (i, s"payload text $i")).toDF("doc_id", "text")
    val r = Multimodal.withMagicPayload(d)
      .withColumn("detected", Multimodal.detectModality(col("payload")))
      .withColumn("idx", Multimodal.modalityIndex(col("doc_id")))
      .collect()
    r.foreach { row =>
      val idx = row.getAs[Long]("idx").toInt
      val expected =
        if (idx == Multimodal.ModalityTags.size) "text/plain"
        else Multimodal.ModalityTags(idx)._1
      assert(row.getAs[String]("detected") == expected, s"doc ${row.getAs[Long]("doc_id")}")
    }
    // the 41-doc hash range exercises all four tags AND the untagged path
    assert(r.map(_.getAs[Long]("idx")).distinct.length == 5)
  }

  test("rep-n duplicate n-gram char fraction: hand-computed coverage") {
    val d = Seq(
      (1L, "a b a b c"), // "a b" repeats at pos 1 and 3 → covers words 1-4 (4 of 5 chars)
      (2L, "aaa bb aaa bb aaa"), // "aaa bb" ×2 → covers all 5 words, 13 chars
      (3L, "all distinct words here now")
    ).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.repNGramChars(d).collect()
      .map(x => (x.getLong(0), x.getInt(1)) ->
        ((x.getLong(2), x.getLong(3), if (x.isNullAt(4)) -1.0 else x.getDouble(4)))).toMap
    assert(r((1L, 2)) == ((4L, 5L, 0.8)))
    assert(r((1L, 3)) == ((0L, 5L, 0.0))) // "a b a","b a b","a b c" all unique
    // doc 2: bigram "aaa bb" at pos 1,3 covers wi 1..4; "bb aaa" at 2,4 covers 2..5
    assert(r((2L, 2)) == ((13L, 13L, 1.0)))
    assert(r((2L, 3)) == ((13L, 13L, 1.0))) // "aaa bb aaa" repeats at pos 1 and 3
    assert(r((2L, 4)) == ((0L, 13L, 0.0))) // 4-grams unique
    assert(r((3L, 2)) == ((0L, 23L, 0.0)))
    // overlapping occurrences count each position once
    val loop = Seq((9L, "a a a a")).toDF("doc_id", "text")
    val lr = graft.operators.TextAnalysis.repNGramChars(loop).collect()
      .map(x => x.getInt(1) -> x.getDouble(4)).toMap
    assert(lr(2) == 1.0 && lr(3) == 1.0)
  }

  test("bm25: hand-computed score on a 3-doc corpus, ranked and bounded") {
    val df = Seq(
      (1L, "spark spark window"), // both query terms, short
      (2L, "spark a b c d e f g h i j k l m n o"), // one hit, long doc
      (3L, "nothing relevant here")).toDF("doc_id", "text")
    val r = TextAnalysis.bm25TopK(df, terms = Seq("spark", "window"), topK = 10)
      .collect()
    // doc 3 has no hits -> filtered; doc 1 beats doc 2 (2 terms, shorter)
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(r.map(_.getInt(3)).toSeq == Seq(1, 2)) // dense ranks
    assert(r(0).getInt(1) == 2 && r(1).getInt(1) == 1) // n_hits
    // hand computation for doc 1, term "spark": N=3, df=2, tf=2, dl=3,
    // avgdl=(3+16+3)/3; idf=ln(1+(3-2+0.5)/(2+0.5)); k1=1.2, b=0.75
    val avgdl = 22.0 / 3
    val idfS = math.log(1 + 1.5 / 2.5)
    val cS = idfS * 2.0 * 2.2 / (2.0 + 1.2 * (0.25 + 0.75 * 3 / avgdl))
    val idfW = math.log(1 + (3 - 1 + 0.5) / 1.5)
    val cW = idfW * 1.0 * 2.2 / (1.0 + 1.2 * (0.25 + 0.75 * 3 / avgdl))
    assert(math.abs(r(0).getDouble(2) - BigDecimal(cS + cW)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("source divergence: 0 for identical, ln2 for disjoint distributions") {
    val df = Seq(
      (1L, "a b c d", "s1"), (2L, "a b c d", "s2"), // identical dists
      (3L, "x y z w", "s3") // disjoint from both
    ).toDF("doc_id", "text", "source")
    val r = TextAnalysis.sourceDivergence(df).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getDouble(3)).toMap
    assert(r(("s1", "s2")) == 0.0)
    val ln2 = BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.get(("s1", "s3")).isEmpty) // no common words -> no inner-join row
    // disjoint pairs carry full missing mass: verify via a shared word
    val df2 = Seq(
      (1L, "k a a a a a a a a a", "s1"),
      (2L, "k z z z z z z z z z", "s2")).toDF("doc_id", "text", "source")
    val d2 = TextAnalysis.sourceDivergence(df2).head.getDouble(3)
    assert(d2 > 0.5 && d2 < ln2) // near-disjoint, bounded by ln2
  }

  test("temperature mixture: upsamples small sources, weights sum to 1") {
    val rows = (1 to 9).map(i => (i.toLong, "a b c d e f g h", "big")) :+
      (10L, "a b", "small")
    val df = rows.toDF("doc_id", "text", "source")
    val r = graft.operators.Sampling.temperatureWeights(df, alpha = 0.7).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2), x.getDouble(3), x.getDouble(4))))
      .toMap
    val (bigT, bigShare, bigW, bigUp) = r("big")
    val (smallT, smallShare, smallW, smallUp) = r("small")
    assert(bigT == 72L && smallT == 2L)
    // α<1 compresses: small source's weight exceeds its share
    assert(smallUp > 1.0 && bigUp < 1.0)
    assert(smallW > smallShare && bigW < bigShare)
    assert(math.abs(bigW + smallW - 1.0) < 1e-5) // weights normalize
    // hand computation: share^0.7 / Σ share^0.7
    val z = math.pow(72.0 / 74, 0.7) + math.pow(2.0 / 74, 0.7)
    assert(math.abs(smallW - math.pow(2.0 / 74, 0.7) / z) < 1e-6)
  }

  test("doremi mixture: below-average sources upweight, weights stay a distribution") {
    // "low" source: terse low-quality docs; "high": long fluent ones
    val rows =
      (1 to 6).map(i => (i.toLong, "x y", "low")) ++
        (7 to 12).map(i =>
          (i.toLong, "the quick brown fox jumps over a lazy dog of the meadow " * 4, "high"))
    val df = rows.toDF("doc_id", "text", "source")
    val r = graft.operators.Sampling.doremiWeights(df).collect()
      .map(x => x.getString(0) ->
        ((x.getDouble(3), x.getDouble(4), x.getDouble(5), x.getDouble(6)))).toMap
    val (lowBase, lowExcess, lowW, lowBoost) = r("low")
    val (_, highExcess, highW, _) = r("high")
    assert(lowExcess > 0.0 && highExcess == 0.0) // only the deficit side carries excess
    assert(lowBoost > 1.0, s"low source must upweight, got $lowBoost")
    assert(lowW > lowBase)
    assert(math.abs(lowW + highW - 1.0) < 1e-5) // still a distribution
    // partition invariance: the trajectory is layout-proof
    val a = graft.operators.Sampling.doremiWeights(df.repartition(7)).collect().toSeq
    val b = graft.operators.Sampling.doremiWeights(df.repartition(1)).collect().toSeq
    assert(a == b)
  }

  test("dsir: target-domain docs outscore off-domain docs") {
    val df = Seq(
      (1L, "alpha beta alpha beta alpha beta", "tgt"),
      (2L, "alpha beta alpha beta gamma", "tgt"),
      (3L, "alpha beta alpha beta alpha", "web"), // target-like off-domain
      (4L, "delta epsilon delta epsilon zeta", "web") // off-domain
    ).toDF("doc_id", "text", "source")
    val r = TextAnalysis
      .dsirScores(df, org.apache.spark.sql.functions.col("source") === "tgt")
      .collect()
      .map(x => x.getLong(0) -> ((x.getBoolean(1), x.getDouble(3), x.getBoolean(4)))).toMap
    assert(r(1L)._1 && !r(3L)._1)
    // the target-like web doc ranks above the disjoint-vocab web doc
    assert(r(3L)._2 > r(4L)._2)
    assert(r(3L)._3 && !r(4L)._3) // target_like flag follows the sign
    // a doc made of target bigrams scores positive
    assert(r(1L)._2 > 0)
  }

  test("span corruption: matches a plain-Scala reimplementation") {
    import java.security.MessageDigest
    def md5hex(s: String): String = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val (spanLen, stride) = (3, 20)
    def expected(docId: Long, words: Seq[String]): (Int, String, String) = {
      val phase = java.lang.Long.parseLong(md5hex(docId.toString).take(8), 16) % stride
      val n = words.length
      val anchors = if (n < spanLen) Seq.empty[Int]
        else (1 to n - spanLen + 1).filter(_ % stride == phase)
      val masked = (1 to n).flatMap { p =>
        val k = anchors.indexOf(p)
        if (k >= 0) Some(s"<extra_id_$k>")
        else if (anchors.exists(a => p > a && p < a + spanLen)) None
        else Some(words(p - 1))
      }.mkString(" ")
      val target = anchors.zipWithIndex.map { case (a, k) =>
        (s"<extra_id_$k>" +: words.slice(a - 1, a - 1 + spanLen)).mkString(" ")
      }.mkString(" ")
      (anchors.length, md5hex(masked), md5hex(target))
    }
    val docs = Seq(
      (7L, (1 to 45).map(i => s"w$i")),
      (8L, (1 to 45).map(i => s"w$i")), // different phase, same words
      (9L, Seq("a", "b"))) // too short for any span
    val df = docs.map { case (id, ws) => (id, ws.mkString(" ")) }.toDF("doc_id", "text")
    val got = graft.operators.Corpus.spanCorruption(df, spanLen, stride).collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getString(3), r.getString(4)))).toMap
    for ((id, ws) <- docs) assert(got(id) == expected(id, ws), s"doc $id")
    assert(got(9L)._1 == 0 && got(9L)._3 == md5hex("")) // empty target
  }

  test("cdc chunks: match a plain-Scala reimplementation") {
    import java.security.MessageDigest
    def md5hex(s: String): String = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def hash32(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(8), 16)
    val div = graft.operators.Corpus.CdcDivisor
    def expected(words: Seq[String]): Seq[(Int, Int, Int, String)] = {
      val n = words.length
      val bnd = if (n < 3) Seq.empty[Int]
        else (3 to n).filter(p => hash32(words.slice(p - 3, p).mkString(" ")) % div == 0)
      val ends = if (bnd.nonEmpty && bnd.last == n) bnd else bnd :+ n
      ends.zipWithIndex.map { case (e, k) =>
        val start = if (k == 0) 1 else ends(k - 1) + 1
        (k, start, e - start + 1, md5hex(words.slice(start - 1, e).mkString(" ")))
      }
    }
    val docs = Seq(
      (1L, (1 to 60).map(i => s"tok${i % 17}")),
      (2L, Seq("only", "two")),
      (3L, (1 to 9).map(i => s"x$i")))
    val df = docs.map { case (id, ws) => (id, ws.mkString(" ")) }.toDF("doc_id", "text")
    val got = graft.operators.Corpus.cdcChunks(df).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getInt(2), r.getInt(3), r.getString(4))))
      .toMap
    for ((id, ws) <- docs; (k, start, len, m) <- expected(ws))
      assert(got((id, k)) == ((start, len, m)), s"doc $id chunk $k")
    assert(got.size == docs.map(d => expected(d._2).size).sum)
  }

  test("cdc chunks: an early insertion re-aligns, fixed-stride chunking does not") {
    val base = (1 to 400).map(i => s"w${(i * 7) % 31}x${i % 13}")
    val edited = Seq("INSERTED", "WORDS", "HERE") ++ base
    val df = Seq((1L, base.mkString(" ")), (2L, edited.mkString(" ")))
      .toDF("doc_id", "text")
    val cdc = graft.operators.Corpus.cdcChunks(df).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(4)).toSeq).toMap
    val shared = cdc(1L).toSet.intersect(cdc(2L).toSet).size
    // all but the first (edited) chunk should re-align to identical md5s
    assert(shared >= cdc(1L).size - 2,
      s"cdc shared $shared of ${cdc(1L).size}")
    val fixed = graft.operators.Corpus.chunkTokens(df).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(3)).toSeq).toMap
    val fixedShared = fixed(1L).toSet.intersect(fixed(2L).toSet).size
    // a 3-word shift breaks every 64-word stride-48 window
    assert(fixedShared == 0, s"fixed-stride shared $fixedShared chunks")
  }

  test("stupid backoff: hand-computed tiers on a tiny reference") {
    import graft.operators.TextAnalysis
    // reference doc: "a b c a b d"; scored doc exercises all 3 tiers:
    //   "a b c" in-ref               -> c3/c2ctx      = 1/2
    //   "b c Z" unseen, "c Z" unseen, Z unseen -> uni tier on Z
    //   "c Z b" unseen tri, "Z b" unseen bg -> uni tier on b (c1=2)
    //   "Z b d" unseen tri, "b d" in-ref bigram -> bi tier: 0.4*(1/2)
    val df = Seq(
      (1L, "ref", "a b c a b d"),
      (2L, "held", "a b c Z b d")).toDF("doc_id", "source", "text")
    val got = TextAnalysis.stupidBackoffScores(df,
      org.apache.spark.sql.functions.col("source") === "ref")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // ref doc: trigrams abc, bca, cab, abd — all tier 0
    assert(got(1L)._1 == 4 && got(1L)._2 == 4 && got(1L)._3 == 0 && got(1L)._4 == 0)
    // held doc: 4 trigrams — 1 tri hit, 1 bi backoff, 2 uni backoffs
    assert(got(2L)._1 == 4 && got(2L)._2 == 1 && got(2L)._3 == 1 && got(2L)._4 == 2)
    val a = TextAnalysis.SbAlpha
    val n = 6d; val v = 4d // ref: 6 words, vocab {a,b,c,d}
    def dec6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = (dec6(math.log(1 / 2d)) + // "a b c": c3=1, c2(a b)=2
      dec6(math.log(a * a * (0 + 0.5) / (n + 0.5 * v))) + // Z unseen anywhere
      dec6(math.log(a * a * (2 + 0.5) / (n + 0.5 * v))) + // "Z b": b seen twice
      dec6(math.log(a * 1 / 2d))) / 4 // "b d": c2=1, c1(b)=2
    assert(math.abs(got(2L)._5 - expected) < 1e-9, s"got ${got(2L)._5} want $expected")
  }

  test("boolean percolation: must_not removes exactly the docs carrying a forbidden term") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "big order fast"),
      (2L, "big order slow"), // forbidden term -> excluded
      (3L, "big nothing else"),
      (4L, "order big slow slow")) // forbidden -> excluded
      .toDF("doc_id", "text")
    val posts = TextAnalysis.positionalPostings(docs)
    val r = TextAnalysis.percolateBoolCensus(posts, Seq(
        ("q_no_slow", Seq("big", "order"), Seq("slow")),
        ("q_plain", Seq("big", "order"), Seq()),
        ("q_never", Seq("big"), Seq("big"))))
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), if (x.isNullAt(2)) -1L else x.getLong(2)))).toMap
    assert(r("q_no_slow") == ((1L, 1L))) // only doc 1
    assert(r("q_plain") == ((3L, 1L))) // docs 1, 2, 4
    assert(r("q_never") == ((0L, -1L))) // must and must_not collide -> empty
  }

  test("rm3: RM1 weights match an independent fold; expansion reaches query-free docs") {
    import graft.operators.TextAnalysis
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "spark window apple apple grape"),
      (2L, "spark banana window apple"),
      (3L, "apple banana cherry"), // no original term — only expansion finds it
      (4L, "cherry cherry cherry grape"),
      (5L, "spark spark other words here"))
      .toDF("doc_id", "text")
    val posts = TextAnalysis.positionalPostings(docs)
    val terms = Seq("spark", "window")
    val w = TextAnalysis.rm3Weights(posts, terms, fbDocs = 2, expTerms = 2)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getBoolean(1), r.getInt(2), r.getDouble(3), r.getDouble(4)))).toMap
    // independent RM1 fold from the feedback list the (q252-proven)
    // BM25 ranker returns
    val fb = TextAnalysis.bm25FromPostings(posts, terms, topK = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val sTot = fb.values.map(BigDecimal(_)).sum.toDouble
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    def dec18(x: Double) = BigDecimal(x).setScale(18, BigDecimal.RoundingMode.HALF_UP)
    val rm1 = fb.keys.flatMap { d =>
      val toks = texts(d)
      toks.distinct.map { t =>
        t -> dec18((fb(d) / sTot) * (toks.count(_ == t).toDouble / toks.length))
      }
    }.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum.toDouble }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    w.foreach { case (word, (isOrig, _, rm1w, rm3w)) =>
      assert(rm1w == r6(rm1.getOrElse(word, 0.0)), s"rm1($word)")
      val expect = if (isOrig) r6(0.5 * (1.0 / terms.size) + 0.5 * rm1.getOrElse(word, 0.0))
        else r6(0.5 * rm1(word))
      assert(rm3w == expect, s"rm3($word): $rm3w vs $expect")
    }
    // originals present; expansion terms are feedback-doc words, not originals
    assert(terms.forall(t => w(t)._1))
    val exp = w.collect { case (t, (false, r, _, _)) => (t, r) }.toSeq.sortBy(_._2)
    assert(exp.size == 2 && exp.forall { case (t, _) => !terms.contains(t) })
    // the expanded second pass retrieves the query-term-free doc 3
    val rr = TextAnalysis.rm3Rerank(posts,
      TextAnalysis.rm3Weights(posts, terms, fbDocs = 2, expTerms = 2))
      .collect().map(_.getLong(1)).toSet
    assert(rr.contains(3L), s"expansion failed to reach doc 3: $rr")
  }

  test("c-tf-idf cluster topics: hand-computed scores, ranks, tie-breaks") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "apple apple banana"), (2L, "apple fruit"), // cluster 0
      (3L, "car car car banana")) // cluster 1
      .toDF("doc_id", "text")
    val asg = Seq((1L, 0L), (2L, 0L), (3L, 1L)).toDF("doc_id", "cent_id")
    val r = TextAnalysis.clusterTopics(docs, asg, k = 3).collect()
      .map(x => (x.getLong(0), x.getInt(1)) -> ((x.getString(2), x.getLong(3), x.getDouble(4))))
      .toMap
    // tot=9 over nc=2 clusters -> A=4.5; tf_corpus: apple 3, banana 2,
    // fruit 1, car 3
    def s(tf: Long, tfc: Long) =
      BigDecimal(tf * math.log(1.0 + 4.5 / tfc))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r((0L, 1)) == (("apple", 3L, s(3, 3))))
    assert(r((0L, 2)) == (("fruit", 1L, s(1, 1))))
    assert(r((0L, 3)) == (("banana", 1L, s(1, 2))))
    assert(r((1L, 1)) == (("car", 3L, s(3, 3))))
    assert(r((1L, 2)) == (("banana", 1L, s(1, 2))))
    assert(r.size == 5)
  }

  test("kneser-ney: hand-computed interpolation, backoff, and floor") {
    import graft.operators.TextAnalysis
    // reference: "a b a b c" + "b c" -> cb {a b:2, b a:1, b c:2};
    // ctx a:(c=2,n1fw=1), b:(c=3,n1fw=2); cont a/b/c all 1 distinct
    // predecessor; b_tot=3, v_cont=3 -> pc(seen)=1.5/5=0.3, pc(oov)=0.1
    val df = Seq(
      (1L, "ref", "a b a b c"),
      (2L, "ref", "b c"),
      (3L, "held", "a b z"), // seen bigram + seen-ctx/unseen-word
      (4L, "held", "z q")) // unseen context -> pure continuation
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.knBigramScores(df,
      org.apache.spark.sql.functions.col("source") === "ref")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    def dec6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 3: "a b" -> (2-.75)/2 + .75*1/2*0.3 = 0.7375;
    //        "b z" -> 0 + .75*2/3*0.1 = 0.05
    assert(got(3L)._1 == 2 && got(3L)._2 == 1 && got(3L)._3 == 2)
    val exp3 = (dec6(math.log(0.7375)) + dec6(math.log(0.75 * 2 / 3d * 0.1))) / 2
    assert(math.abs(got(3L)._4 - exp3) < 1e-9, s"got ${got(3L)._4} want $exp3")
    // doc 4: context z unseen in ref -> P = pc(q) = 0.1
    assert(got(4L)._1 == 1 && got(4L)._2 == 0 && got(4L)._3 == 0)
    assert(math.abs(got(4L)._4 - dec6(math.log(0.1))) < 1e-9)
    // ref doc 1: every bigram and context in-model
    assert(got(1L)._1 == 4 && got(1L)._2 == 4 && got(1L)._3 == 4)
  }

  test("bpe merge pairs: frequency-weighted adjacent pairs over the vocab") {
    val df = Seq(
      (1L, "aab aab ba"), // vocab: aab(wf 2) -> aa, ab; ba(wf 1) -> ba
      (2L, "aab x")) // aab wf -> 3; x is length-1 (no pairs)
      .toDF("doc_id", "text")
    val r = graft.operators.Corpus.bpeMergePairs(df, topK = 10).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getInt(3)))).toMap
    assert(r("aa") == ((3L, 1L, 1)) || r("aa") == ((3L, 1L, 2)))
    assert(r("ab")._1 == 3L && r("ab")._2 == 1L)
    assert(r("ba") == ((1L, 1L, 3)))
    assert(r.size == 3) // "x" contributes nothing
    // "aaa" yields "aa" twice (overlapping positions both count)
    val overlap = Seq((1L, "aaa")).toDF("doc_id", "text")
    val o = graft.operators.Corpus.bpeMergePairs(overlap).collect()
    assert(o.length == 1 && o(0).getString(0) == "aa" && o(0).getLong(1) == 2L)
  }

  test("subword tokenization: hand-computed greedy longest-match") {
    import graft.operators.Corpus
    // vocab top-3 by (weight desc, gram asc): ab(6), cd(4), aba(2)
    val docs = Seq(
      (1L, "abab abab cdcd", "s1"),
      (2L, "abcd ab cd", "s1")).toDF("doc_id", "text", "source")
    val r = Corpus.subwordTokenize(docs, vocabSize = 3, rounds = 8)
      .orderBy("doc_id").collect()
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // doc 1: abab -> aba b; cdcd -> cd cd
    assert(r(0).getAs[Long]("n_words") == 3)
    assert(r(0).getAs[Long]("n_subwords") == 6)
    assert(r(0).getAs[Double]("fertility") == 2.0)
    assert(r(0).getAs[String]("tokens_md5") == md5("aba b aba b cd cd"))
    // doc 2: abcd -> ab cd; ab; cd
    assert(r(1).getAs[Long]("n_subwords") == 4)
    assert(r(1).getAs[Double]("fertility") == 1.333333)
    assert(r(1).getAs[String]("tokens_md5") == md5("ab cd ab cd"))
    // a word longer than the unroll must fail loudly, not truncate
    val long = Seq((1L, "abcdefghijklm", "s1")).toDF("doc_id", "text", "source")
    intercept[IllegalArgumentException] {
      Corpus.subwordTokenize(long, vocabSize = 3, rounds = 8)
    }
  }

  test("subword segmentation is lossless on a seeded random corpus") {
    import graft.operators.Corpus
    val rnd = new scala.util.Random(42)
    val words = (0 until 40).map(_ =>
      (1 to (1 + rnd.nextInt(8))).map(_ => "abcd".charAt(rnd.nextInt(4))).mkString)
    val docs = words.grouped(8).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" "), "s1") }.toSeq
      .toDF("doc_id", "text", "source")
    val enc = Corpus.subwordEncodings(docs, vocabSize = 6, rounds = 9).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val (w, n, toks) = (r.getString(0), r.getInt(1), r.getString(2))
      assert(toks.replace(" ", "") == w, s"segmentation of '$w' lost bytes: '$toks'")
      assert(toks.split(" ").count(_.nonEmpty) == n, s"token count mismatch for '$w'")
    }
  }

  test("term burstiness: Poisson-flat terms at VMR 0, bursty terms well above") {
    val docs = Seq(
      (1L, "flat bursty bursty bursty bursty bursty pad1"),
      (2L, "flat bursty pad2 pad2a x"),
      (3L, "flat bursty pad3 y z"),
      (4L, "flat w1 w2"),
      (5L, "flat w3 w4")).toDF("doc_id", "text")
    val posts = TextAnalysis.positionalPostings(docs)
    val r = TextAnalysis.termBurstiness(posts, minDf = 3, topN = 10).collect()
      .map(x => (x.getString(0), (x.getLong(1), x.getLong(2), x.getDouble(4)))).toMap
    // "flat": tf = 1 in every doc → variance 0 → VMR exactly 0
    assert(r("flat") == ((5L, 5L, 0.0)))
    // "bursty": tfs (5, 1, 1) → mean 7/3, E[t²] = 9, VMR = (9 − 49/9)/(7/3)
    val mean = 7.0 / 3.0
    val want = BigDecimal((9.0 - mean * mean) / mean)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r("bursty") == ((3L, 7L, want)))
    assert(r("bursty")._3 > 1.0, "a bursty term must exceed the Poisson line")
    // df floor: terms below minDf never report
    assert(!r.contains("pad1") && !r.contains("w1"))
  }
}
