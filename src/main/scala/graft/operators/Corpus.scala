package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for LLM training data: sequence packing
  * (concat-then-chunk document → training-sequence assignment) and
  * sliding-window token chunking (RAG/embedding chunks with overlap).
  *
  * Scale design: packing is one windowed running sum per stratum (keyed
  * shuffle, linear state — NEVER a global single-task window: the
  * stream is packed per source so a trillion-token corpus packs in
  * parallel); chunking is a narrow explode with per-row bounded arrays.
  * All arithmetic is integer/string-exact — no rounding, engines agree
  * bit-for-bit.
  */
object Corpus {

  /** Assign each document its position in per-source concatenated
    * training sequences of `tokenBudget` tokens ("concat then chunk").
    * seq_id = the chunk the doc STARTS in; offset_in_seq its start
    * offset there. Deterministic order: doc_id within source.
    */
  def packSequences(docs: DataFrame, tokenBudget: Int = 256,
      textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("source"), col("doc_id"), size(split(col(textCol), " ")).as("n_tokens"))
      .withColumn("start_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_id", (col("start_offset") / tokenBudget).cast("long"))
      .withColumn("offset_in_seq", (col("start_offset") % tokenBudget).cast("long"))
  }

  /** Sliding-window token chunks: windows of `chunkTokens` words every
    * `stride` words (overlap = chunkTokens - stride), one row per chunk
    * with its text fingerprint. The generated array per row is bounded
    * by chunkTokens — a book-length doc yields many rows, never a big
    * one.
    */
  def chunkTokens(docs: DataFrame, chunkTokens: Int = 64, stride: Int = 48,
      textCol: String = "text"): DataFrame = {
    val w = split(col(textCol), " ")
    docs
      .select(col("doc_id"), w.as("w"), size(w).as("n_tokens"))
      .select(col("doc_id"), col("w"), col("n_tokens"),
        explode(sequence(lit(1), col("n_tokens"), lit(stride))).as("start"))
      .select(
        col("doc_id"),
        ((col("start") - 1) / stride).cast("int").as("chunk_idx"),
        least(lit(chunkTokens), col("n_tokens") - col("start") + 1).as("chunk_len"),
        md5(concat_ws(" ", slice(col("w"), col("start"), lit(chunkTokens)))).as("chunk_md5"))
  }

  /** Benchmark decontamination: per-document count/share of word
    * 3-gram shingles that also appear in a benchmark/eval document set
    * (`benchPred`) — the standard n-gram contamination check run before
    * training. Per-doc shingles dedup map-side (array_distinct before
    * explode); the benchmark gram set is keyed and joined by equality,
    * so cost is linear in corpus grams + one keyed join, never
    * all-pairs.
    */
  def contamination(docs: DataFrame, benchPred: org.apache.spark.sql.Column,
      textCol: String = "text", threshold: Double = 0.05): DataFrame = {
    import graft.functions.Text
    val withSh = docs.select(col("doc_id"), benchPred.as("is_bench"),
      array_distinct(Text.shingles(col(textCol))).as("gs"))
    // The eval/benchmark side is small BY CONTRACT (a benchmark suite,
    // not a second corpus): explode only those docs and broadcast the
    // distinct gram set, so the corpus side never shuffles on raw
    // shingle strings. benchPred prunes before the explode.
    val bench = withSh.filter(col("is_bench"))
      .select(explode(col("gs")).as("g")).distinct()
      .withColumn("hit", lit(1))
    // ONE corpus shingling pass: explode per-doc distinct grams, flag
    // benchmark grams via the broadcast left join, and take BOTH counts
    // from the same aggregation (n_grams = all rows since gs is
    // distinct; n_shared = flagged rows). An earlier version derived
    // totals and hits from separate branches — two extra full
    // text-shingling passes over the corpus.
    // size > 0 keeps parity with the explode formulation (and the
    // oracle), which drops docs too short to have any 3-gram.
    withSh.filter(!col("is_bench") && size(col("gs")) > 0)
      .select(col("doc_id"), explode(col("gs")).as("g"))
      .join(broadcast(bench), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_shared"))
      .withColumn("contamination", col("n_shared") / col("n_grams"))
      .withColumn("is_contaminated", col("contamination") > threshold)
  }

  /** T5-style span-corruption example generation (Raffel et al. 2020
    * §3.1.4): replace word spans with numbered sentinels and emit the
    * (masked input, target) pair a denoising pretrainer consumes.
    * Randomness is replaced by a DETERMINISTIC grid: spans of
    * `spanLen` words start at positions ≡ the doc's md5-derived phase
    * (mod `stride`), so ~spanLen/stride of tokens are corrupted
    * (15% at the 3/20 defaults), anchors can never overlap, and both
    * engines derive identical examples — the property a reproducible
    * data pipeline needs anyway.
    *
    * Scale design: the entire transform is narrow per-row array
    * expressions (sequence/filter/transform/flatten) — zero shuffles,
    * zero explodes; a trillion-document corpus corrupts
    * embarrassingly parallel. Output carries md5s of input/target
    * (array-output convention, cf. q89).
    */
  def spanCorruption(docs: DataFrame, spanLen: Int = 3, stride: Int = 20,
      textCol: String = "text"): DataFrame = {
    // the non-overlap contract below only holds when spans fit the grid
    require(spanLen >= 1 && spanLen <= stride,
      s"spanLen must be in [1, stride]: spans of $spanLen at stride $stride would overlap")
    import graft.functions.{Hashes, Text}
    val sentinel = (k: Column) => concat(lit("<extra_id_"), k.cast("string"), lit(">"))
    // masked input: anchor -> numbered sentinel, in-span non-anchor ->
    // dropped; everything else passes through
    val input = array_join(filter(transform(sequence(lit(1), size(col("w"))), p => {
      val k = array_position(col("anchors"), p) - 1
      when(k >= 0, sentinel(k))
        .otherwise(when(exists(col("anchors"),
          a => p > a && p < a + spanLen), lit(null).cast("string"))
          .otherwise(element_at(col("w"), p)))
    }), x => x.isNotNull), " ")
    // target: <extra_id_k> followed by the k-th span's words
    val target = array_join(flatten(transform(col("anchors"), (a, k) =>
      concat(array(sentinel(k)), slice(col("w"), a, lit(spanLen))))), " ")
    docs
      .select(col("doc_id"), Text.words(col(textCol)).as("w"))
      // anchor positions: p in [1, n-spanLen+1] with p % stride == the
      // doc's md5-derived phase (sequence guarded against n < spanLen,
      // where its descending form would fire)
      .withColumn("anchors",
        when(size(col("w")) >= spanLen,
          filter(sequence(lit(1), size(col("w")) - (spanLen - 1)),
            p => p % stride === (Hashes.md5Long32(col("doc_id").cast("string")) % stride).cast("int")))
          .otherwise(array().cast("array<int>")))
      .select(col("doc_id"), size(col("w")).as("n_words"),
        size(col("anchors")).as("n_spans"),
        md5(input).as("input_md5"),
        md5(target).as("target_md5"))
      .orderBy("doc_id")
  }

  val CdcWindow = 3 // rolling window (words) the boundary test hashes
  val CdcDivisor = 8 // boundary when hash % divisor == 0 → ~8-word chunks

  /** Content-defined chunking (the LBFS/FastCDC storage-dedup idea
    * re-expressed over word shingles): a chunk boundary falls AFTER
    * word p exactly when the [[CdcWindow]]-gram ending at p hashes to
    * 0 mod [[CdcDivisor]] — so a chunk's span depends only on its
    * CONTENT, and an insertion early in a document re-aligns within one
    * expected chunk instead of shifting every downstream chunk the way
    * fixed-stride chunking ([[chunkTokens]]) does. That re-alignment is
    * the property that makes chunk-level dedup robust to edits.
    *
    * Scale design: pure narrow array expressions per row (sequence/
    * filter/slice), zero shuffle; a trillion-document corpus chunks
    * embarrassingly parallel. Docs shorter than the window are one
    * chunk. Expected chunk length is the divisor (~8 words) — bounded
    * arrays per row.
    */
  def cdcChunks(docs: DataFrame, divisor: Int = CdcDivisor,
      textCol: String = "text"): DataFrame = {
    import graft.functions.{Hashes, Text}
    // POSITION-ROW shape, not per-doc arrays: an array formulation
    // (filter(sequence(...), md5...) + posexplode) re-evaluates the
    // md5-bearing boundary array once per OUTPUT chunk when the
    // projection collapses into the generator — measured ~7× the
    // hashing cost at sf0.1 — and, being fully narrow, inherits the
    // input's file parallelism (a single-file corpus runs one-core).
    // Exploding words to rows pays the boundary md5 exactly once per
    // position as a plain projection, and the doc-keyed window shuffle
    // both restores parallelism and feeds the chunk aggregation
    // without a second exchange (doc_id partitioning satisfies the
    // (doc_id, chunk_idx) clustering).
    val wd = Window.partitionBy("doc_id").orderBy("q")
    val run = wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), posexplode(Text.words(col(textCol))).as(Seq("q0", "word")))
      .select(col("doc_id"), (col("q0") + 1).as("q"), col("word"))
      // boundary AFTER position q: md5 of the CdcWindow-gram ending at
      // q (the preceding words arrive by lag — derived from CdcWindow
      // so the batch and streaming formulations cannot silently
      // diverge; q >= CdcWindow guards the ramp-up)
      .withColumn("is_bnd",
        col("q") >= CdcWindow &&
          Hashes.md5Long32(concat_ws(" ",
            ((CdcWindow - 1) to 1 by -1).map(o => lag(col("word"), o).over(wd)) :+
              col("word"): _*)) % divisor === 0)
      // chunk index of word q = boundaries strictly before q
      .withColumn("chunk_idx",
        sum(when(lag(col("is_bnd"), 1, false).over(wd), 1).otherwise(0)).over(run)
          .cast("int"))
      .groupBy("doc_id", "chunk_idx")
      .agg(
        min(col("q")).cast("int").as("start_word"),
        count(lit(1)).cast("int").as("n_words"),
        md5(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("q"), col("word")))),
          s => s.getField("word")))).as("chunk_md5"))
      .select(col("doc_id"), col("chunk_idx"), col("start_word"),
        col("n_words"), col("chunk_md5"))
  }

  /** Per-DOCUMENT boilerplate census over [[cdcChunks]] — the doc-level
    * twin of [[cdcDedupStats]]'s corpus summary, and the curation
    * signal it cannot give: a chunk is SHARED when its md5 appears in
    * ≥2 distinct documents (navigation shells, license blocks, scraped
    * templates), and a document whose words are mostly shared chunks is
    * boilerplate to drop or down-weight, whatever its other quality
    * scores say.
    *
    * Scale shape: the chunk stream is corpus-linear; shared-chunk
    * detection is ONE (chunk_md5 → distinct docs) aggregation; the
    * verdict joins back keyed on chunk_md5 — no pair space, no doc
    * self-join at any corpus size.
    */
  def boilerplateCensus(docs: DataFrame, divisor: Int = CdcDivisor,
      textCol: String = "text"): DataFrame = {
    val ch = cdcChunks(docs, divisor, textCol)
    val shared = ch.groupBy("chunk_md5")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("chunk_md5"), lit(true).as("is_shared"))
    ch.join(shared, Seq("chunk_md5"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("is_shared"), 1L).otherwise(0L)).as("n_shared_chunks"),
        sum(col("n_words").cast("long")).as("n_words"),
        sum(when(col("is_shared"), col("n_words").cast("long")).otherwise(0L))
          .as("shared_words"))
      .withColumn("boilerplate_ratio",
        round(col("shared_words").cast("double") / col("n_words"), 6))
      .orderBy("doc_id")
  }

  /** Chunk-level dedup report over [[cdcChunks]]: how much of the
    * corpus is duplicated at chunk granularity — the storage/training
    * dedup ratio CDC exists to maximize. One hash aggregation on
    * chunk_md5 (the only shuffle), then a single-row summary:
    * total/distinct chunks, chunks seen in >1 place, and the words a
    * dedup store would save by keeping one copy per distinct chunk.
    */
  def cdcDedupStats(docs: DataFrame, divisor: Int = CdcDivisor,
      textCol: String = "text"): DataFrame = {
    import graft.functions.Num
    cdcChunks(docs, divisor, textCol)
      .groupBy("chunk_md5")
      .agg(count(lit(1)).as("n_occ"), min(col("n_words")).as("n_words"))
      .agg(
        sum(col("n_occ")).as("total_chunks"),
        count(lit(1)).as("distinct_chunks"),
        sum(when(col("n_occ") > 1, 1).otherwise(0)).as("dup_chunk_keys"),
        sum((col("n_occ") - 1) * col("n_words")).as("words_saved"),
        round(Num.davg((col("n_occ") > 1).cast("int").cast("double")), 6).as("dup_key_share"))
  }

  val PadBatchSize = 32 // documents per training batch in the report

  /** Padding-waste report: tokens wasted padding each batch to its
    * longest member, under (a) arrival order (doc_id) and (b)
    * length-sorted order — the measured version of why sequence-length
    * bucketing exists (sorted batching groups like lengths, so the
    * per-batch max hugs the mean and the pad share collapses).
    *
    * Scale note: the two row_number orderings are global sorts at
    * report time — acceptable for a diagnostic (one ~word-count-shaped
    * pass per strategy); a production packer would bucket by length
    * range instead of total-ordering the corpus.
    *
    * Output, one row per strategy: n_batches, data tokens, padded
    * tokens, waste share.
    */
  def paddingWaste(docs: DataFrame, batchSize: Int = PadBatchSize,
      textCol: String = "text"): DataFrame = {
    val lens = docs.select(col("doc_id"), size(split(col(textCol), " ")).as("len"))
    def report(strategy: String, order: Seq[Column]): DataFrame =
      lens
        .withColumn("batch_id",
          ((row_number().over(Window.orderBy(order: _*)) - 1) / batchSize).cast("long"))
        .groupBy("batch_id")
        .agg(count(lit(1)).as("bsz"), sum(col("len")).as("data_tokens"),
          (max(col("len")) * count(lit(1))).as("slot_tokens"))
        .agg(
          count(lit(1)).as("n_batches"),
          sum(col("data_tokens")).as("data_tokens"),
          sum(col("slot_tokens") - col("data_tokens")).as("padded_tokens"),
          round((sum(col("slot_tokens") - col("data_tokens")).cast("double") /
            sum(col("slot_tokens"))), 6).as("waste_share"))
        .select(lit(strategy).as("strategy"), col("n_batches"),
          col("data_tokens"), col("padded_tokens"), col("waste_share"))
    report("arrival", Seq(col("doc_id")))
      .unionByName(report("length_sorted", Seq(col("len"), col("doc_id"))))
  }

  /** First BPE-merge iteration over the corpus vocabulary: the
    * adjacent-character-pair counts a tokenizer trainer computes before
    * its first merge, weighted by corpus word frequency (BPE trains on
    * the word-frequency dictionary, not the raw stream — Sennrich et
    * al. 2016, "Neural Machine Translation of Rare Words with Subword
    * Units" §3.2). `pair_count` = total corpus occurrences of the pair
    * inside words; `n_words` = distinct vocabulary words containing it.
    *
    * Scale design: the raw token stream collapses to the vocabulary
    * (one word-count shuffle) BEFORE any character work, so pair
    * explosion is over distinct words only — vocabulary size, not
    * corpus size. Top-k goes through orderBy+limit
    * (TakeOrderedAndProject), never a global window.
    */
  def bpeMergePairs(docs: DataFrame, topK: Int = 30,
      textCol: String = "text"): DataFrame = {
    import graft.functions.Text
    val vocab = docs
      .select(explode(Text.words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wf"))
    val top = vocab
      .filter(length(col("w")) > 1)
      .select(col("w"), col("wf"),
        explode(transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy("pair")
      .agg(sum(col("wf")).as("pair_count"), count_distinct(col("w")).as("n_words"))
      .orderBy(desc("pair_count"), col("pair")).limit(topK)
    top.withColumn("rank",
      row_number().over(Window.orderBy(desc("pair_count"), col("pair"))))
      .select("pair", "pair_count", "n_words", "rank")
      .orderBy("rank")
  }

  val SubwordVocab = 24 // multi-gram vocabulary entries (chars are implicit fallback)
  val SubwordRounds = 8 // unrolled greedy steps; must cover max word length

  /** Subword tokenization of the corpus: train a character n-gram
    * vocabulary (top-[[SubwordVocab]] 2/3/4-grams of the word
    * dictionary, frequency-weighted) and encode every document by
    * greedy longest-match (WordPiece-inference semantics with
    * char-fallback, Wu et al. 2016 §4.1). Returns per doc the
    * whitespace word count, the subword count, the fertility ratio,
    * and an md5 over the full ordered token stream — the encoded-corpus
    * artifact a tokenizer stage ships.
    *
    * Scale design: the classic dictionary trick — the greedy loop runs
    * over DISTINCT words (vocabulary-sized, shuffled once), never the
    * token stream; each of the [[SubwordRounds]] unrolled steps is
    * three broadcast gram-lookups + a narrow projection, and the corpus
    * is touched once at the end by a broadcast word→encoding join.
    * Deterministic: exact integer frequencies, (count DESC, gram ASC)
    * vocabulary ties, fixed longest-match order — the DuckDB oracle
    * replays training AND encoding.
    */
  /** The dictionary-level half of [[subwordTokenize]]: per DISTINCT
    * word its greedy segmentation — (w, n_toks, toks). Exposed so the
    * lossless-segmentation property (tokens re-concatenate to the
    * word) is directly testable.
    */
  def subwordEncodings(docs: DataFrame, vocabSize: Int = SubwordVocab,
      rounds: Int = SubwordRounds, textCol: String = "text"): DataFrame = {
    import graft.functions.Text
    val wf = docs
      .select(explode(Text.words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .localCheckpoint(true)
    // coalesce: max over an EMPTY vocabulary is null — an empty corpus
    // should produce an empty encoding table, not a getInt NPE
    val maxLen = wf.agg(coalesce(max(length(col("w"))), lit(0))).head().getInt(0)
    require(maxLen <= rounds,
      s"greedy unroll covers $rounds chars but the longest word has $maxLen — raise rounds")
    val grams = (2 to 4).map { n =>
      wf.filter(length(col("w")) >= n)
        .select(col("f"),
          explode(transform(sequence(lit(1), length(col("w")) - (n - 1)),
            i => col("w").substr(i, lit(n)))).as("g"))
    }.reduce(_ unionByName _)
    val vocab = grams.groupBy("g").agg(sum(col("f")).as("gw"))
      .orderBy(desc("gw"), col("g")).limit(vocabSize)
      .select(col("g"), length(col("g")).as("gl"))
      .localCheckpoint(true)
    def vb(n: Int) = broadcast(
      vocab.filter(col("gl") === n).select(col("g").as(s"g$n")))
    var st = wf.select(col("w"), lit(1).as("pos"), lit(0).as("n_toks"), lit("").as("toks"))
    var round0 = 0
    for (_ <- 1 to rounds) {
      round0 += 1
      val done = col("pos") > length(col("w"))
      st = st
        .join(vb(4), col("g4") === expr("substr(w, pos, 4)"), "left")
        .join(vb(3), col("g3") === expr("substr(w, pos, 3)"), "left")
        .join(vb(2), col("g2") === expr("substr(w, pos, 2)"), "left")
        .withColumn("tok", coalesce(col("g4"), col("g3"), col("g2"), expr("substr(w, pos, 1)")))
        .withColumn("len",
          when(col("g4").isNotNull, 4).when(col("g3").isNotNull, 3)
            .when(col("g2").isNotNull, 2).otherwise(1))
        .select(col("w"),
          when(done, col("pos")).otherwise(col("pos") + col("len")).as("pos"),
          when(done, col("n_toks")).otherwise(col("n_toks") + 1).as("n_toks"),
          when(done, col("toks")).otherwise(concat(col("toks"), lit(" "), col("tok"))).as("toks"))
      // checkpoint every second round (the viterbiEncode discipline):
      // each eager materialization is a job + 3 broadcast rebuilds over
      // the dictionary — a 2-round (6-join) segment halves that count
      if (round0 % 2 == 0 || round0 == rounds) st = st.localCheckpoint(true)
    }
    st.select(col("w"), col("n_toks"), ltrim(col("toks")).as("toks"))
  }

  val UnigramVocab = 32 // multi-gram candidate pieces (chars are implicit)
  val UnigramRounds = 8 // DP positions; must cover max word length

  /** Piece scores from a (g, cnt) table: vcost = -ln(cnt / total), the
    * unigram negative log-likelihood. One 1-row broadcast for the
    * total; the ln is the same IEEE op both engines run.
    */
  private def scoredVocab(v: DataFrame): DataFrame = {
    val tot = v.agg(sum(col("cnt")).as("tot"))
    v.crossJoin(broadcast(tot))
      .select(col("g"),
        (-log(col("cnt").cast("double") / col("tot").cast("double"))).as("vcost"))
  }

  /** Viterbi segmentation of every DISTINCT word under `vocab` piece
    * costs (g, vcost): the minimum-total-cost split into pieces of
    * length 1–4, ties preferring the LONGER final piece. Same unrolled
    * shape as [[subwordEncodings]] — each of the `rounds` position
    * steps is four broadcast piece lookups + a narrow projection, with
    * the DP state (per-prefix best cost / token string / piece count)
    * carried as bounded array columns. Input (w, f); output
    * (w, f, n_toks, toks, cost).
    */
  private def viterbiEncode(wf: DataFrame, vocab: DataFrame, rounds: Int): DataFrame = {
    val vl = (1 to 4).map(l =>
      broadcast(vocab.select(col("g").as(s"g$l"), col("vcost").as(s"vc$l"))))
    var st = wf.select(col("w"), col("f"),
      array(lit(0.0)).as("costs"), array(lit("")).as("toks"), array(lit(0)).as("ntoks"))
    for (t <- 1 to rounds) {
      val inWord = length(col("w")) >= t
      var s2 = st
      for (l <- 1 to 4)
        s2 = s2.join(vl(l - 1),
          col(s"g$l") === (if (t >= l) when(inWord, expr(s"substr(w, ${t - l + 1}, $l)"))
                           else lit(null).cast("string")),
          "left")
      for (l <- 1 to 4)
        s2 = s2.withColumn(s"c$l",
          if (t >= l) when(inWord, element_at(col("costs"), t - l + 1) + col(s"vc$l"))
          else lit(null).cast("double"))
      st = s2
        .withColumn("m", least(col("c1"), col("c2"), col("c3"), col("c4")))
        .withColumn("lstar",
          when(col("c4") === col("m"), 4).when(col("c3") === col("m"), 3)
            .when(col("c2") === col("m"), 2).otherwise(1))
        .withColumn("piece",
          when(col("c4") === col("m"), col("g4")).when(col("c3") === col("m"), col("g3"))
            .when(col("c2") === col("m"), col("g2")).otherwise(col("g1")))
        .select(col("w"), col("f"),
          when(col("m").isNull, col("costs"))
            .otherwise(array_append(col("costs"), col("m"))).as("costs"),
          when(col("m").isNull, col("toks"))
            .otherwise(array_append(col("toks"),
              concat(element_at(col("toks"), lit(t + 1) - col("lstar")),
                lit(" "), col("piece")))).as("toks"),
          when(col("m").isNull, col("ntoks"))
            .otherwise(array_append(col("ntoks"),
              element_at(col("ntoks"), lit(t + 1) - col("lstar")) + 1)).as("ntoks"))
      // checkpoint every second round: each eager materialization costs a
      // job over the dictionary, and a 2-round (8-join) plan segment is
      // still well inside codegen limits — halves the DP's job count
      if (t % 2 == 0 || t == rounds) st = st.localCheckpoint(true)
    }
    st.select(col("w"), col("f"),
      element_at(col("ntoks"), length(col("w")) + 1).as("n_toks"),
      ltrim(element_at(col("toks"), length(col("w")) + 1)).as("toks"),
      element_at(col("costs"), length(col("w")) + 1).as("cost"))
  }

  /** Candidate piece table (g, cnt): every single character plus the
    * top-`vocabSize` 2/3/4-grams of the word dictionary, both
    * frequency-weighted; (cnt DESC, g ASC) ties, orderBy+limit
    * (TakeOrderedAndProject) for the top-k.
    */
  private def unigramPieces(wf: DataFrame, vocabSize: Int): DataFrame = {
    val chars = wf.filter(length(col("w")) >= 1)
      .select(col("f"),
        explode(transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1)))).as("g"))
      .groupBy("g").agg(sum(col("f")).as("cnt"))
    val multi = (2 to 4).map { n =>
      wf.filter(length(col("w")) >= n)
        .select(col("f"),
          explode(transform(sequence(lit(1), length(col("w")) - (n - 1)),
            i => col("w").substr(i, lit(n)))).as("g"))
    }.reduce(_ unionByName _)
      .groupBy("g").agg(sum(col("f")).as("cnt"))
      .orderBy(desc("cnt"), col("g")).limit(vocabSize)
    chars.unionByName(multi)
  }

  /** Unigram-LM subword tokenizer (Kudo 2018, ACL — "Subword
    * Regularization"), as one hard-EM round: score candidate pieces by
    * weighted substring frequency, Viterbi-segment the dictionary
    * (OPTIMAL splits, where [[subwordEncodings]] is greedy), re-count
    * pieces from the segmentations actually chosen, prune unused
    * multi-char pieces, re-score add-1-smoothed, and re-segment under
    * the trained model. Everything runs over the DISTINCT-word
    * dictionary (vocabulary-sized, never the token stream) and the EM
    * statistics are exact integers, so the DuckDB oracle replays
    * training and both segmentation passes bit-for-bit.
    *
    * Returns the dictionary encodings (w, f, n_toks, toks, cost) under
    * the trained model, plus the trained vocab via
    * [[unigramVocabReport]].
    */
  def unigramEncodings(docs: DataFrame, vocabSize: Int = UnigramVocab,
      rounds: Int = UnigramRounds, textCol: String = "text"): DataFrame = {
    val wf = wordFreq(docs, rounds, textCol)
    viterbiEncode(wf,
      scoredVocab(trainedUnigramVocab(wf, vocabSize, rounds).select(col("g"), col("cnt"))),
      rounds)
  }

  private def wordFreq(docs: DataFrame, rounds: Int, textCol: String): DataFrame = {
    import graft.functions.Text
    val wf = docs
      .select(explode(Text.words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .localCheckpoint(true)
    val maxLen = wf.agg(coalesce(max(length(col("w"))), lit(0))).head().getInt(0)
    require(maxLen <= rounds,
      s"Viterbi unroll covers $rounds chars but the longest word has $maxLen — raise rounds")
    wf
  }

  /** The trained piece table (g, cnt = used + 1, used): candidate
    * scores → Viterbi pass 1 → piece usage counts → prune multi-char
    * pieces Viterbi never chose → add-1 smoothing (chars always stay:
    * every word must remain segmentable).
    */
  private def trainedUnigramVocab(wf: DataFrame, vocabSize: Int,
      rounds: Int): DataFrame = {
    val v0 = unigramPieces(wf, vocabSize).localCheckpoint(true)
    val enc1 = viterbiEncode(wf, scoredVocab(v0), rounds)
    val used = enc1
      .select(col("f"), explode(split(col("toks"), " ")).as("g"))
      .filter(col("g") =!= "")
      .groupBy("g").agg(sum(col("f")).as("used"))
    v0.join(used, Seq("g"), "left")
      .withColumn("used", coalesce(col("used"), lit(0L)))
      .filter(length(col("g")) === 1 || col("used") > 0)
      .select(col("g"), (col("used") + 1).as("cnt"), col("used"))
      .localCheckpoint(true)
  }

  /** The trained unigram vocabulary artifact: piece, length, usage
    * count from the EM pass, and the trained -ln p score.
    */
  def unigramVocabReport(docs: DataFrame, vocabSize: Int = UnigramVocab,
      rounds: Int = UnigramRounds, textCol: String = "text"): DataFrame = {
    val v1 = trainedUnigramVocab(wordFreq(docs, rounds, textCol), vocabSize, rounds)
    v1.join(scoredVocab(v1.select("g", "cnt")), "g")
      .select(col("g"), length(col("g")).as("piece_len"), col("used"),
        round(col("vcost"), 6).as("score"))
      .orderBy(desc("used"), col("g"))
  }

  /** Per-doc rollup of the trained unigram segmentation — the q179
    * shape (words / subwords / fertility / ordered-stream md5) plus the
    * model's average per-token cost (decimal-backed sum, one rounded
    * divide). Corpus touched once by a broadcast word→encoding join.
    */
  def unigramTokenize(docs: DataFrame, vocabSize: Int = UnigramVocab,
      rounds: Int = UnigramRounds, textCol: String = "text"): DataFrame = {
    import graft.functions.{Num, Text}
    val enc = unigramEncodings(docs, vocabSize, rounds, textCol)
    docs
      .select(col("doc_id"), posexplode(Text.words(col(textCol))).as(Seq("pos0", "word")))
      .join(broadcast(enc), col("word") === col("w"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("n_toks").cast("long")).as("n_subwords"),
        Num.dsum(col("cost")).as("total_cost"),
        md5(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos0"), col("toks")))),
          x => x.getField("toks")))).as("tokens_md5"))
      .withColumn("fertility",
        round(col("n_subwords").cast("double") / col("n_words"), 6))
      .withColumn("avg_cost",
        round(col("total_cost") / col("n_subwords"), 6))
      .select("doc_id", "n_words", "n_subwords", "fertility", "avg_cost", "tokens_md5")
  }

  def subwordTokenize(docs: DataFrame, vocabSize: Int = SubwordVocab,
      rounds: Int = SubwordRounds, textCol: String = "text"): DataFrame = {
    import graft.functions.Text
    val enc = subwordEncodings(docs, vocabSize, rounds, textCol)
    docs
      .select(col("doc_id"), posexplode(Text.words(col(textCol))).as(Seq("pos0", "word")))
      .join(broadcast(enc), col("word") === col("w"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("n_toks").cast("long")).as("n_subwords"),
        md5(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos0"), col("toks")))),
          x => x.getField("toks")))).as("tokens_md5"))
      .withColumn("fertility",
        round(col("n_subwords").cast("double") / col("n_words"), 6))
      .select("doc_id", "n_words", "n_subwords", "fertility", "tokens_md5")
  }

  /** DuckDB oracle twins. */
  /** GLOBAL concat-then-chunk packing census — ONE stream order over
    * the whole corpus (the reproducible pretraining data-order
    * contract: fixed order ⇒ fixed chunk boundaries ⇒ byte-identical
    * training sequences across re-runs), computed WITHOUT the
    * corpus-wide single-partition window a naive global running sum
    * plans. Two-level prefix sum: doc_id-range buckets give (a) a
    * per-bucket running sum — a KEYED window, corpus-parallel — and
    * (b) a bucket-total frame of n/bucketSize rows whose own running
    * sum is each bucket's global offset. The only unpartitioned window
    * runs over THAT frame: at 100 TB pick bucketSize so it stays ~1e5
    * rows (or apply the same trick once more — it composes). Then
    * start = bucket offset + within-bucket prefix, chunk = start div
    * capacity — all integer arithmetic, engine-exact.
    *
    * Output: per training chunk, the docs STARTING there (chunks fully
    * interior to one long document emit no row), their token mass, and
    * how many straddle the chunk boundary — the fragmentation signal
    * that prices a capacity choice before a packing job runs.
    */
  def globalPackingCensus(docs: DataFrame, capacity: Long = 2048L,
      bucketSize: Long = 100L, textCol: String = "text"): DataFrame = {
    require(capacity > 0 && bucketSize > 0, "capacity and bucketSize must be positive")
    val d = docs.select(col("doc_id"),
      size(split(col(textCol), " ")).cast("long").as("dl"),
      expr(s"doc_id div $bucketSize").as("bucket"))
    val wIn = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val within = d.withColumn("within", coalesce(sum(col("dl")).over(wIn), lit(0L)))
    // bucket-total frame: n/bucketSize rows — the only unpartitioned
    // window runs over THIS frame, never over the corpus
    val wB = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    val boff = d.groupBy("bucket").agg(sum(col("dl")).as("bt"))
      .withColumn("boff", coalesce(sum(col("bt")).over(wB), lit(0L)))
      .select("bucket", "boff")
    val placed = within.join(broadcast(boff), "bucket")
      .withColumn("st", col("boff") + col("within"))
      .withColumn("chunk_id", expr(s"st div $capacity"))
      .withColumn("crossing",
        (expr(s"(st + dl - 1) div $capacity") > col("chunk_id")).cast("long"))
    placed.groupBy("chunk_id").agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("n_tokens"),
      sum(col("crossing")).as("n_crossing"))
      .orderBy("chunk_id")
  }

  /** Fill-in-the-middle example generation (Bainbridge et al. /
    * "Efficient Training of Language Models to Fill in the Middle",
    * 2022 — the causal-infilling transform beside q154's T5 span
    * corruption): each document splits at two DETERMINISTIC cut points
    * (md5-derived, so both engines and every rerun derive identical
    * examples) into (prefix, middle, suffix), and the example is
    * emitted in both canonical orders — PSM
    * `<pre>P<suf>S<mid>M` and SPM `<suf>S<pre>P<mid>M` — as md5
    * fingerprints (the array-output convention). Docs shorter than 3
    * words can't split and are passed through flagged. Pure narrow
    * per-row array expressions: no shuffle, no explode.
    */
  def fimExamples(docs: DataFrame, textCol: String = "text"): DataFrame = {
    import graft.functions.{Hashes, Text}
    val n = size(col("w"))
    // two cut points in [1, n-1] (word boundaries), ordered: the middle
    // is non-empty iff lo < hi; lo = hi yields an empty middle, kept
    // (the paper keeps empty-middle examples — they teach the no-op)
    val h1 = Hashes.md5Long32(concat(lit("fim1:"), col("doc_id").cast("string")))
    val h2 = Hashes.md5Long32(concat(lit("fim2:"), col("doc_id").cast("string")))
    val joinPart = (a: Column, b: Column) => array_join(slice(col("w"), a, b), " ")
    docs
      .select(col("doc_id"), Text.words(col(textCol)).as("w"))
      .select(col("doc_id"), col("w"), n.as("n"),
        (lit(1) + pmod(h1, greatest(n - 1, lit(1))).cast("int")).as("p1"),
        (lit(1) + pmod(h2, greatest(n - 1, lit(1))).cast("int")).as("p2"))
      .select(col("doc_id"), col("w"), col("n"),
        least(col("p1"), col("p2")).as("lo"), greatest(col("p1"), col("p2")).as("hi"))
      .select(
        col("doc_id"), col("n").cast("int").as("n_words"),
        (col("n") >= 3).as("splittable"),
        col("lo"), col("hi"),
        (col("hi") - col("lo")).cast("int").as("middle_len"),
        md5(when(col("n") >= 3, concat_ws(" ",
          lit("<pre>"), joinPart(lit(1), col("lo")),
          lit("<suf>"), joinPart(col("hi") + 1, col("n") - col("hi")),
          lit("<mid>"), joinPart(col("lo") + 1, col("hi") - col("lo"))))
          .otherwise(col("w")(0))).as("psm_md5"),
        md5(when(col("n") >= 3, concat_ws(" ",
          lit("<suf>"), joinPart(col("hi") + 1, col("n") - col("hi")),
          lit("<pre>"), joinPart(lit(1), col("lo")),
          lit("<mid>"), joinPart(col("lo") + 1, col("hi") - col("lo"))))
          .otherwise(col("w")(0))).as("spm_md5"))
  }

  /** Seeded, deterministic, RESUMABLE global training order — the data
    * order a reproducible training run needs: every document gets a
    * stable position from md5(seed:doc_id) (a new seed is a fresh
    * epoch-level shuffle; the same seed replays bit-identically on any
    * cluster size or partitioning), positions pack into fixed-size
    * batches, and the per-batch manifest carries an order fingerprint —
    * so "resume from step k" is provably the same data the interrupted
    * run would have seen.
    *
    * Scale design: lexicographic order on fixed-width lowercase-hex md5
    * equals numeric order, so the first two hex chars form 256 ORDERED
    * range buckets; the global rank is the two-level prefix sum of
    * [[globalPackingCensus]] — a keyed within-bucket row_number plus
    * one tiny window over the 256-row bucket frame. No corpus-wide
    * single-partition window, no zipWithIndex, no driver sort.
    */
  def trainingOrder(docs: DataFrame, seed: String = "graft", batchSize: Int = 64,
      textCol: String = "text"): DataFrame =
    batchManifest(trainingRanks(docs, seed, batchSize, textCol))

  /** The rank machinery behind [[trainingOrder]]: (doc_id, nt, rank,
    * batch_id) — shared with [[noveltyCurve]] and composable with any
    * per-doc signal.
    */
  private[graft] def trainingRanks(docs: DataFrame, seed: String, batchSize: Int,
      textCol: String): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val d = docs.select(col("doc_id"),
      size(split(col(textCol), " ")).cast("long").as("nt"),
      md5(concat(lit(s"$seed:"), col("doc_id").cast("string"))).as("key"))
      .withColumn("bucket", substring(col("key"), 1, 2))
    val wIn = Window.partitionBy("bucket").orderBy("key", "doc_id")
    val wB = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    val boff = d.groupBy("bucket").agg(count(lit(1)).as("bn"))
      .withColumn("boff", coalesce(sum(col("bn")).over(wB), lit(0L)))
      .select("bucket", "boff")
    d.withColumn("within", row_number().over(wIn))
      .join(broadcast(boff), "bucket")
      .withColumn("rank", col("boff") + col("within"))
      .withColumn("batch_id", expr(s"(rank - 1) div $batchSize"))
      .select("doc_id", "nt", "rank", "batch_id")
  }

  /** Per-batch manifest over a (doc_id, nt, rank, batch_id[, ...]) rank
    * frame, with the exact-order fingerprint.
    */
  private def batchManifest(ranks: DataFrame,
      extra: Seq[Column] = Nil): DataFrame =
    ranks
      .groupBy("batch_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("nt")).as("n_tokens") +: (extra :+
          min(col("rank")).as("first_rank") :+
          md5(concat_ws(",", transform(
            array_sort(collect_list(struct(col("rank"), col("doc_id")))),
            x => x.getField("doc_id").cast("string")))).as("order_md5")): _*)
      .orderBy("batch_id")

  /** CURRICULUM training order (easy→hard phases with a seeded shuffle
    * INSIDE each phase — the Bengio et al. 2009 schedule as a data
    * op): quality-score terciles (exact rounded percentile cutoffs,
    * the q284 convention) order the phases head → middle → tail, and
    * within a phase every doc gets the same seeded md5 position as
    * [[trainingOrder]]. The per-batch manifest carries the phase mix,
    * so the schedule is auditable (early batches pure head, boundary
    * batches straddle).
    *
    * Scale: the rank is the same two-level prefix sum, just
    * partitioned by (phase, bucket) with a 3·256-row offset frame;
    * cutoffs are a 1-row broadcast.
    */
  def curriculumOrder(docs: DataFrame, seed: String = "graft",
      batchSize: Int = 64, textCol: String = "text"): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val qs = TextAnalysis.withTextStats(docs).select(col("doc_id"), col("quality_score"))
    val cuts = qs.agg(
      round(percentile(col("quality_score"), lit(1.0 / 3)), 6).as("c1"),
      round(percentile(col("quality_score"), lit(2.0 / 3)), 6).as("c2"))
    val d = docs.select(col("doc_id"),
      size(split(col(textCol), " ")).cast("long").as("nt"),
      md5(concat(lit(s"$seed:"), col("doc_id").cast("string"))).as("key"))
      .join(qs, "doc_id")
      .crossJoin(broadcast(cuts))
      .withColumn("phase",
        when(col("quality_score") > col("c2"), 0)
          .when(col("quality_score") > col("c1"), 1)
          .otherwise(2))
      .withColumn("bucket", substring(col("key"), 1, 2))
    val wIn = Window.partitionBy("phase", "bucket").orderBy("key", "doc_id")
    val wB = Window.orderBy("phase", "bucket").rowsBetween(Window.unboundedPreceding, -1)
    val boff = d.groupBy("phase", "bucket").agg(count(lit(1)).as("bn"))
      .withColumn("boff", coalesce(sum(col("bn")).over(wB), lit(0L)))
      .select("phase", "bucket", "boff")
    val ranked = d.withColumn("within_rn", row_number().over(wIn))
      .join(broadcast(boff), Seq("phase", "bucket"))
      .withColumn("rank", col("boff") + col("within_rn"))
      .withColumn("batch_id", expr(s"(rank - 1) div $batchSize"))
      .select("doc_id", "nt", "rank", "batch_id", "phase")
    batchManifest(ranked, Seq(
      sum(when(col("phase") === 0, 1L).otherwise(0L)).as("n_head"),
      sum(when(col("phase") === 1, 1L).otherwise(0L)).as("n_middle"),
      sum(when(col("phase") === 2, 1L).otherwise(0L)).as("n_tail")))
  }

  /** Mixture-balanced INTERLEAVED training order (stride scheduling —
    * the deterministic spelling of "draw from source s with probability
    * n_s/N"): every document gets a seeded per-source rank (the same
    * two-level machinery as [[trainingOrder]], partitioned by source),
    * its progress key rank/n_s ∈ (0,1] measures how far through its
    * source's quota it sits, and the global order sorts by progress —
    * so every batch reproduces the corpus mixture to within rounding,
    * with no randomness and no coordination. The census reports each
    * batch's source mix against the corpus share.
    *
    * Scale: per-source ranks via (source, bucket) keyed windows + a
    * |sources|·256-row offset frame; the global progress rank via 256
    * ordered progress buckets + their tiny offset frame — never a
    * corpus-wide single-partition window.
    */
  def mixtureInterleave(docs: DataFrame, seed: String = "graft",
      batchSize: Int = 64, textCol: String = "text"): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val d = docs.select(col("doc_id"), col("source"),
      md5(concat(lit(s"$seed:"), col("doc_id").cast("string"))).as("key"))
      .withColumn("bucket", substring(col("key"), 1, 2))
    // per-source seeded rank: within (source, hex bucket) + offsets
    val wIn = Window.partitionBy("source", "bucket").orderBy("key", "doc_id")
    val wSb = Window.partitionBy("source").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val sOff = d.groupBy("source", "bucket").agg(count(lit(1)).as("bn"))
      .withColumn("boff", coalesce(sum(col("bn")).over(wSb), lit(0L)))
      .select("source", "bucket", "boff")
    val sizes = d.groupBy("source").agg(count(lit(1)).as("ns"))
    val keyed = d.withColumn("within", row_number().over(wIn))
      .join(broadcast(sOff), Seq("source", "bucket"))
      .join(broadcast(sizes), "source")
      .withColumn("progress",
        (col("boff") + col("within")).cast("double") / col("ns"))
      // 256 ordered progress-range buckets over (0, 1]
      .withColumn("pbucket",
        least(floor(col("progress") * 256).cast("int"), lit(255)))
    val wP = Window.partitionBy("pbucket").orderBy("progress", "source", "doc_id")
    val wPb = Window.orderBy("pbucket").rowsBetween(Window.unboundedPreceding, -1)
    val pOff = keyed.groupBy("pbucket").agg(count(lit(1)).as("pn"))
      .withColumn("poff", coalesce(sum(col("pn")).over(wPb), lit(0L)))
      .select("pbucket", "poff")
    val ranked = keyed.withColumn("prn", row_number().over(wP))
      .join(broadcast(pOff), "pbucket")
      .withColumn("rank", col("poff") + col("prn"))
      .withColumn("batch_id", expr(s"(rank - 1) div $batchSize"))
    val total = docs.agg(count(lit(1)).as("n_total"))
    ranked.groupBy("batch_id", "source")
      .agg(count(lit(1)).as("n_docs"))
      .join(broadcast(sizes), "source")
      .crossJoin(broadcast(total))
      .withColumn("batch_total",
        sum(col("n_docs")).over(Window.partitionBy("batch_id")))
      .select(col("batch_id"), col("source"), col("n_docs"),
        round(col("n_docs").cast("double") / col("batch_total"), 6).as("batch_share"),
        round(col("ns").cast("double") / col("n_total"), 6).as("corpus_share"))
      .withColumn("abs_dev", round(abs(col("batch_share") - col("corpus_share")), 6))
      .orderBy("batch_id", "source")
  }

  /** N-gram NOVELTY curve along the training order — the data-freshness
    * diagnostic of a chosen schedule: per batch, how many of its
    * distinct word 3-grams appear here for the FIRST time (no
    * occurrence in any earlier batch), plus the cumulative distinct
    * gram count (Heaps growth in training order). One distinct
    * (batch, gram) projection, one keyed min, one tiny window over the
    * batch frame.
    */
  def noveltyCurve(docs: DataFrame, seed: String = "graft", batchSize: Int = 64,
      textCol: String = "text"): DataFrame = {
    import graft.functions.Text
    val ranks = trainingRanks(docs, seed, batchSize, textCol)
    val dg = docs
      .select(col("doc_id"),
        explode(array_distinct(Text.shingles(col(textCol), 3))).as("g"))
      .select(col("doc_id"), md5(col("g")).as("gk"))
      .join(ranks.select("doc_id", "batch_id"), "doc_id")
      .select("batch_id", "gk")
      .distinct()
    // gk-keyed window MIN instead of groupBy + self-join: one gram
    // shuffle and one (batch, gram) computation instead of two of each
    // (guide §2.4; identical rows — see Dedup.substringRemoval)
    val perBatch = dg
      .withColumn("fb", min(col("batch_id")).over(Window.partitionBy("gk")))
      .groupBy("batch_id")
      .agg(
        count(lit(1)).as("n_distinct_grams"),
        sum(when(col("batch_id") === col("fb"), 1L).otherwise(0L)).as("n_new_grams"))
    val wCum = Window.orderBy("batch_id").rowsBetween(Window.unboundedPreceding, 0)
    ranks.groupBy("batch_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
      .join(perBatch, Seq("batch_id"), "left")
      .select(col("batch_id"), col("n_docs"), col("n_tokens"),
        coalesce(col("n_distinct_grams"), lit(0L)).as("n_distinct_grams"),
        coalesce(col("n_new_grams"), lit(0L)).as("n_new_grams"))
      .withColumn("novelty_rate",
        round(when(col("n_distinct_grams") > 0,
          col("n_new_grams").cast("double") / col("n_distinct_grams")), 6))
      .withColumn("cum_new_grams", sum(col("n_new_grams")).over(wCum))
      .orderBy("batch_id")
  }

  object O {
    import graft.functions.{Hashes, Num}

    /** DP round CTEs replaying [[Corpus.viterbiEncode]]'s unrolled
      * Viterbi over vocab relation `voc`, from `${p}st0` to
      * `${p}st$rounds` — the identical candidate costs (NULL-skipping
      * least), longer-piece tie-break, and list-state appends.
      */
    private def viterbiCtes(p: String, voc: String, rounds: Int): String =
      (1 to rounds).map { t =>
        val joins = (1 to 4).filter(_ <= t).map(l =>
          s"LEFT JOIN $voc v$l ON v$l.g = (CASE WHEN length(s.w) >= $t THEN substr(s.w, ${t - l + 1}, $l) END)")
          .mkString("\n        ")
        val gcols = (1 to 4).map(l =>
          if (l <= t) s"v$l.g AS g$l" else s"CAST(NULL AS VARCHAR) AS g$l").mkString(", ")
        val ccols = (1 to 4).map(l =>
          if (l <= t)
            s"CASE WHEN length(s.w) >= $t THEN s.costs[${t - l + 1}] + v$l.vcost END AS c$l"
          else s"CAST(NULL AS DOUBLE) AS c$l").mkString(",\n          ")
        s"""${p}st$t AS (
           |  SELECT w, f,
           |    CASE WHEN m IS NULL THEN costs ELSE list_append(costs, m) END AS costs,
           |    CASE WHEN m IS NULL THEN toks
           |         ELSE list_append(toks, toks[${t + 1} - lstar] || ' ' || piece) END AS toks,
           |    CASE WHEN m IS NULL THEN ntoks
           |         ELSE list_append(ntoks, ntoks[${t + 1} - lstar] + 1) END AS ntoks
           |  FROM (
           |    SELECT *,
           |      CASE WHEN c4 = m THEN 4 WHEN c3 = m THEN 3 WHEN c2 = m THEN 2 ELSE 1 END AS lstar,
           |      CASE WHEN c4 = m THEN g4 WHEN c3 = m THEN g3 WHEN c2 = m THEN g2 ELSE g1 END AS piece
           |    FROM (
           |      SELECT *, least(c1, c2, c3, c4) AS m FROM (
           |        SELECT s.w, s.f, s.costs, s.toks, s.ntoks, $gcols,
           |          $ccols
           |        FROM ${p}st${t - 1} s
           |        $joins))))""".stripMargin
      }.mkString(",\n")

    /** The shared training + double-segmentation chain of the unigram
      * tokenizer (candidate scores → Viterbi `a` → usage counts →
      * pruned add-1 vocab → Viterbi `b`), ending in relations `v1`,
      * `voc1` (trained vocab) and `benc` (trained encodings).
      */
    private def unigramCtes(vocabSize: Int, rounds: Int): String = {
      val gramSel = (2 to 4).map { n =>
        s"""SELECT substr(w, i, $n) AS g, f FROM (
           |  SELECT w, f, CAST(unnest(range(1, length(w) - ${n - 2})) AS INT) AS i
           |  FROM wf WHERE length(w) >= $n)""".stripMargin
      }.mkString(" UNION ALL ")
      def enc(p: String) =
        s"""SELECT w, f, ntoks[length(w) + 1] AS n_toks,
           |  ltrim(toks[length(w) + 1]) AS toks, costs[length(w) + 1] AS cost
           |  FROM ${p}st$rounds""".stripMargin
      s"""wf AS MATERIALIZED (SELECT w, COUNT(*) AS f FROM (
         |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) GROUP BY w),
         |ch AS (SELECT g, CAST(SUM(f) AS BIGINT) AS cnt FROM (
         |    SELECT substr(w, i, 1) AS g, f FROM (
         |      SELECT w, f, CAST(unnest(range(1, length(w) + 1)) AS INT) AS i
         |      FROM wf WHERE length(w) >= 1)) GROUP BY g),
         |mg AS (SELECT g, cnt FROM (
         |    SELECT g, CAST(SUM(f) AS BIGINT) AS cnt FROM ($gramSel) GROUP BY g
         |    ORDER BY cnt DESC, g LIMIT $vocabSize)),
         |v0 AS MATERIALIZED (SELECT * FROM ch UNION ALL SELECT * FROM mg),
         |t0 AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM v0),
         |voc0 AS MATERIALIZED (SELECT g, -ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE)) AS vcost
         |         FROM v0 CROSS JOIN t0),
         |ast0 AS (SELECT w, f, [CAST(0.0 AS DOUBLE)] AS costs, [''] AS toks, [0] AS ntoks FROM wf),
         |${viterbiCtes("a", "voc0", rounds)},
         |aenc AS (${enc("a")}),
         |used AS (SELECT g, CAST(SUM(f) AS BIGINT) AS used FROM (
         |    SELECT f, unnest(string_split(toks, ' ')) AS g FROM aenc)
         |  WHERE g != '' GROUP BY g),
         |v1 AS MATERIALIZED (SELECT v0.g, CAST(COALESCE(u.used, 0) + 1 AS BIGINT) AS cnt,
         |         CAST(COALESCE(u.used, 0) AS BIGINT) AS used
         |       FROM v0 LEFT JOIN used u USING (g)
         |       WHERE length(v0.g) = 1 OR COALESCE(u.used, 0) > 0),
         |t1 AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM v1),
         |voc1 AS MATERIALIZED (SELECT g, -ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE)) AS vcost
         |         FROM v1 CROSS JOIN t1),
         |bst0 AS (SELECT w, f, [CAST(0.0 AS DOUBLE)] AS costs, [''] AS toks, [0] AS ntoks FROM wf),
         |${viterbiCtes("b", "voc1", rounds)},
         |benc AS (${enc("b")})""".stripMargin
    }

    /** Mirrors [[Corpus.unigramTokenize]]: trained-model segmentation
      * rolled up per doc, decimal-backed cost sum, one rounded divide.
      */
    def unigramTokenize(vocabSize: Int = UnigramVocab,
        rounds: Int = UnigramRounds): String =
      s"""WITH ${unigramCtes(vocabSize, rounds)},
         |d0 AS (SELECT doc_id, wl, CAST(unnest(range(1, len(wl) + 1)) AS INT) AS pos
         |       FROM (SELECT doc_id, string_split(text, ' ') AS wl FROM documents)),
         |d AS (SELECT doc_id, pos, wl[pos] AS word FROM d0)
         |SELECT doc_id, COUNT(*) AS n_words,
         |  CAST(SUM(CAST(e.n_toks AS BIGINT)) AS BIGINT) AS n_subwords,
         |  round(CAST(SUM(CAST(e.n_toks AS BIGINT)) AS DOUBLE) / COUNT(*), 6) AS fertility,
         |  round(${Num.O.sum("e.cost")} / CAST(SUM(CAST(e.n_toks AS BIGINT)) AS BIGINT), 6) AS avg_cost,
         |  md5(string_agg(e.toks, ' ' ORDER BY pos)) AS tokens_md5
         |FROM d JOIN benc e ON e.w = d.word
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin

    /** Mirrors [[Corpus.unigramVocabReport]]: the trained piece table
      * with usage counts and rounded -ln p scores.
      */
    def unigramVocab(vocabSize: Int = UnigramVocab,
        rounds: Int = UnigramRounds): String =
      s"""WITH ${unigramCtes(vocabSize, rounds)}
         |SELECT g, CAST(length(g) AS INT) AS piece_len, used, round(vcost, 6) AS score
         |FROM v1 JOIN voc1 USING (g)
         |ORDER BY used DESC, g""".stripMargin

    /** Mirrors subwordTokenize: identical vocabulary training
      * (frequency-weighted grams, count-DESC/gram-ASC ties) and the
      * same unrolled greedy longest-match rounds over the word
      * dictionary (length-tagged vocab joins, char fallback).
      */
    def subwordTokenize(vocabSize: Int = SubwordVocab,
        rounds: Int = SubwordRounds): String = {
      val gramSel = (2 to 4).map { n =>
        s"""SELECT substr(w, i, $n) AS g, f FROM (
           |  SELECT w, f, CAST(unnest(range(1, length(w) - ${n - 2})) AS INT) AS i
           |  FROM wf WHERE length(w) >= $n)""".stripMargin
      }.mkString(" UNION ALL ")
      val stRounds = (1 to rounds).map { t =>
        s"""st$t AS (
           |  SELECT w,
           |    CASE WHEN pos > length(w) THEN pos ELSE pos + len END AS pos,
           |    CASE WHEN pos > length(w) THEN n_toks ELSE n_toks + 1 END AS n_toks,
           |    CASE WHEN pos > length(w) THEN toks ELSE toks || ' ' || tok END AS toks
           |  FROM (
           |    SELECT s.w, s.pos, s.n_toks, s.toks,
           |      COALESCE(v4.g, v3.g, v2.g, substr(s.w, s.pos, 1)) AS tok,
           |      CASE WHEN v4.g IS NOT NULL THEN 4 WHEN v3.g IS NOT NULL THEN 3
           |           WHEN v2.g IS NOT NULL THEN 2 ELSE 1 END AS len
           |    FROM st${t - 1} s
           |    LEFT JOIN vocab v4 ON v4.gl = 4 AND v4.g = substr(s.w, s.pos, 4)
           |    LEFT JOIN vocab v3 ON v3.gl = 3 AND v3.g = substr(s.w, s.pos, 3)
           |    LEFT JOIN vocab v2 ON v2.gl = 2 AND v2.g = substr(s.w, s.pos, 2)))""".stripMargin
      }.mkString(",\n")
      s"""WITH wf AS (SELECT w, COUNT(*) AS f FROM (
         |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) GROUP BY w),
         |grams AS ($gramSel),
         |vocab AS (SELECT g, CAST(length(g) AS INT) AS gl FROM (
         |  SELECT g, SUM(f) AS gw FROM grams GROUP BY g ORDER BY gw DESC, g LIMIT $vocabSize)),
         |st0 AS (SELECT w, CAST(1 AS INT) AS pos, CAST(0 AS INT) AS n_toks, '' AS toks FROM wf),
         |$stRounds,
         |enc AS (SELECT w, n_toks, ltrim(toks) AS toks FROM st$rounds),
         |d0 AS (SELECT doc_id, wl, CAST(unnest(range(1, len(wl) + 1)) AS INT) AS pos
         |       FROM (SELECT doc_id, string_split(text, ' ') AS wl FROM documents)),
         |d AS (SELECT doc_id, pos, wl[pos] AS word FROM d0)
         |SELECT doc_id, COUNT(*) AS n_words,
         |  CAST(SUM(CAST(e.n_toks AS BIGINT)) AS BIGINT) AS n_subwords,
         |  round(CAST(SUM(CAST(e.n_toks AS BIGINT)) AS DOUBLE) / COUNT(*), 6) AS fertility,
         |  md5(string_agg(e.toks, ' ' ORDER BY pos)) AS tokens_md5
         |FROM d JOIN enc e ON e.w = d.word
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    }

    /** CTE chain `base, bn, en, ch` ending in the per-chunk rows —
      * the bit-identical twin of [[Corpus.cdcChunks]]. DuckDB
      * range(a, b) is [a, b) = Spark sequence(a, b-1); `bnd[-1]` on an
      * empty list is NULL, so the `= n` test is false and the doc-end
      * boundary appends — the same null-safe fallthrough as Spark's
      * element_at(-1) on empty.
      */
    private def cdcChunkCtes(divisor: Int): String = {
      val gram = "w[p-2] || ' ' || w[p-1] || ' ' || w[p]"
      s"""base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |bn AS (SELECT doc_id, w, len(w) AS n,
         |  CASE WHEN len(w) >= $CdcWindow THEN
         |    list_filter(range($CdcWindow, len(w) + 1), p -> (${Hashes.O.md5Long32(gram)} % $divisor) = 0)
         |  ELSE [] END AS bnd FROM base),
         |en AS (SELECT doc_id, w, n,
         |  CASE WHEN bnd[-1] = n THEN bnd ELSE list_append(bnd, n) END AS ends FROM bn),
         |ch AS (SELECT doc_id, CAST(k - 1 AS INT) AS chunk_idx,
         |    CAST(CASE WHEN k = 1 THEN 1 ELSE ends[k - 1] + 1 END AS INT) AS start_word,
         |    CAST(ends[k] - (CASE WHEN k = 1 THEN 0 ELSE ends[k - 1] END) AS INT) AS n_words,
         |    md5(array_to_string(list_slice(w, CASE WHEN k = 1 THEN 1 ELSE ends[k - 1] + 1 END, ends[k]), ' ')) AS chunk_md5
         |  FROM en, unnest(range(1, len(ends) + 1)) t(k))""".stripMargin
    }

    /** Mirrors cdcChunks. */
    def cdcChunks(divisor: Int = CdcDivisor): String =
      s"""WITH ${cdcChunkCtes(divisor)}
         |SELECT doc_id, chunk_idx, start_word, n_words, chunk_md5
         |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin

    /** Mirrors boilerplateCensus: same shared-key derivation, same
      * left-join verdict, ratio rounded identically.
      */
    def boilerplateCensus(divisor: Int = CdcDivisor): String =
      s"""WITH ${cdcChunkCtes(divisor)},
         |sh AS (SELECT chunk_md5 FROM (
         |         SELECT chunk_md5, COUNT(DISTINCT doc_id) AS nd FROM ch GROUP BY 1)
         |       WHERE nd >= 2)
         |SELECT ch.doc_id, COUNT(*) AS n_chunks,
         |  CAST(SUM(CASE WHEN sh.chunk_md5 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_chunks,
         |  CAST(SUM(ch.n_words) AS BIGINT) AS n_words,
         |  CAST(SUM(CASE WHEN sh.chunk_md5 IS NOT NULL THEN ch.n_words ELSE 0 END) AS BIGINT) AS shared_words,
         |  round(CAST(SUM(CASE WHEN sh.chunk_md5 IS NOT NULL THEN ch.n_words ELSE 0 END) AS DOUBLE)
         |    / CAST(SUM(ch.n_words) AS DOUBLE), 6) AS boilerplate_ratio
         |FROM ch LEFT JOIN sh ON ch.chunk_md5 = sh.chunk_md5
         |GROUP BY ch.doc_id ORDER BY ch.doc_id""".stripMargin

    /** Mirrors cdcDedupStats. */
    def cdcDedupStats(divisor: Int = CdcDivisor): String =
      s"""WITH ${cdcChunkCtes(divisor)},
         |g AS (SELECT chunk_md5, COUNT(*) AS n_occ, MIN(n_words) AS n_words
         |      FROM ch GROUP BY chunk_md5)
         |SELECT CAST(SUM(n_occ) AS BIGINT) AS total_chunks,
         |  COUNT(*) AS distinct_chunks,
         |  CAST(SUM(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunk_keys,
         |  CAST(SUM((n_occ - 1) * n_words) AS BIGINT) AS words_saved,
         |  round(${Num.O.avg("CAST(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END AS DOUBLE)")}, 6) AS dup_key_share
         |FROM g""".stripMargin

    /** Mirrors paddingWaste (DuckDB `//` = Spark's double-div + long
      * cast for these positive exact-integer operands).
      */
    def paddingWaste(batchSize: Int = PadBatchSize): String = {
      def rep(strategy: String, order: String) =
        s"""SELECT '$strategy' AS strategy, CAST(COUNT(*) AS BIGINT) AS n_batches,
           |  CAST(SUM(dt) AS BIGINT) AS data_tokens,
           |  CAST(SUM(st - dt) AS BIGINT) AS padded_tokens,
           |  round(CAST(SUM(st - dt) AS DOUBLE) / SUM(st), 6) AS waste_share
           |FROM (SELECT batch_id, SUM(len) AS dt, MAX(len) * COUNT(*) AS st
           |      FROM (SELECT ((row_number() OVER (ORDER BY $order)) - 1) // $batchSize AS batch_id, len
           |            FROM lens)
           |      GROUP BY batch_id)""".stripMargin
      s"""WITH lens AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS len FROM documents)
         |SELECT * FROM (${rep("arrival", "doc_id")}
         |UNION ALL ${rep("length_sorted", "len, doc_id")})
         |ORDER BY strategy""".stripMargin
    }

    /** Mirrors contamination (benchPredSql over doc_id etc.). */
    def contamination(benchPredSql: String, threshold: Double = 0.05): String =
      s"""WITH wl AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
         |       FROM wl WHERE len(w) >= 3),
         |bench AS (SELECT DISTINCT g FROM sh WHERE $benchPredSql),
         |c AS (SELECT doc_id, g FROM sh WHERE NOT ($benchPredSql)),
         |t AS (SELECT doc_id, COUNT(*) AS n_grams FROM c GROUP BY 1),
         |h AS (SELECT doc_id, COUNT(*) AS n_shared FROM c JOIN bench USING (g) GROUP BY 1)
         |SELECT t.doc_id, t.n_grams, COALESCE(h.n_shared, 0) AS n_shared,
         |  (COALESCE(h.n_shared, 0) / t.n_grams) AS contamination,
         |  ((COALESCE(h.n_shared, 0) / t.n_grams) > $threshold) AS is_contaminated
         |FROM t LEFT JOIN h USING (doc_id) ORDER BY doc_id""".stripMargin
    /** Mirrors [[Corpus.globalPackingCensus]]: the same two-level
      * prefix sum (per-bucket partitioned running sum + bucket-total
      * running sum), integer-exact throughout. `//` is DuckDB's
      * trunc-toward-zero integer division ≡ Spark's `div`.
      */
    def globalPackingCensus(capacity: Long = 2048L, bucketSize: Long = 100L): String =
      s"""WITH d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
         |    doc_id // $bucketSize AS bucket FROM documents),
         |wi AS (SELECT doc_id, dl, bucket,
         |    COALESCE(SUM(dl) OVER (PARTITION BY bucket ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS within FROM d),
         |bs AS (SELECT bucket, SUM(dl) AS bt FROM d GROUP BY bucket),
         |bo AS (SELECT bucket, COALESCE(SUM(bt) OVER (ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS boff FROM bs),
         |p AS (SELECT (bo.boff + wi.within) // $capacity AS chunk_id, wi.dl,
         |        CASE WHEN (bo.boff + wi.within + wi.dl - 1) // $capacity
         |                  > (bo.boff + wi.within) // $capacity THEN 1 ELSE 0 END AS crossing
         |      FROM wi JOIN bo USING (bucket))
         |SELECT CAST(chunk_id AS BIGINT) AS chunk_id, COUNT(*) AS n_docs,
         |  CAST(SUM(dl) AS BIGINT) AS n_tokens, CAST(SUM(crossing) AS BIGINT) AS n_crossing
         |FROM p GROUP BY chunk_id ORDER BY chunk_id""".stripMargin

    /** Shared rank CTEs (ending in p(doc_id, nt, rank, batch_id)) —
      * the two-level prefix-sum replay behind trainingOrder and
      * noveltyCurve.
      */
    private def rankCtes(seed: String, batchSize: Int): String =
      s"""d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
         |    md5('$seed:' || CAST(doc_id AS VARCHAR)) AS key FROM documents),
         |b AS (SELECT doc_id, nt, key, substr(key, 1, 2) AS bucket FROM d),
         |wi AS (SELECT doc_id, nt, bucket,
         |    row_number() OVER (PARTITION BY bucket ORDER BY key, doc_id) AS within FROM b),
         |bs AS (SELECT bucket, COUNT(*) AS bn FROM b GROUP BY bucket),
         |bo AS (SELECT bucket, COALESCE(SUM(bn) OVER (ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS boff FROM bs),
         |p AS (SELECT wi.doc_id, wi.nt, bo.boff + wi.within AS rank,
         |        (bo.boff + wi.within - 1) // $batchSize AS batch_id
         |      FROM wi JOIN bo USING (bucket))""".stripMargin

    /** Mirrors [[Corpus.fimExamples]]: identical md5 cut points; the
      * possibly-empty middle COALESCEs (DuckDB's array_to_string of an
      * empty list is NULL where Spark's array_join is '').
      */
    def fimExamples(): String = {
      val h1 = Hashes.O.md5Long32("'fim1:' || CAST(doc_id AS VARCHAR)")
      val h2 = Hashes.O.md5Long32("'fim2:' || CAST(doc_id AS VARCHAR)")
      val pre = "array_to_string(w[1:lo], ' ')"
      val suf = "array_to_string(w[hi+1:n], ' ')"
      val mid = "COALESCE(array_to_string(w[lo+1:hi], ' '), '')"
      s"""WITH b AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |c AS (SELECT doc_id, w, len(w) AS n,
         |        1 + ($h1 % greatest(len(w) - 1, 1)) AS p1,
         |        1 + ($h2 % greatest(len(w) - 1, 1)) AS p2
         |      FROM b),
         |d AS (SELECT doc_id, w, n, least(p1, p2) AS lo, greatest(p1, p2) AS hi FROM c)
         |SELECT doc_id, CAST(n AS INT) AS n_words, (n >= 3) AS splittable,
         |  CAST(lo AS INT) AS lo, CAST(hi AS INT) AS hi,
         |  CAST(hi - lo AS INT) AS middle_len,
         |  md5(CASE WHEN n >= 3 THEN concat_ws(' ', '<pre>', $pre, '<suf>', $suf, '<mid>', $mid)
         |      ELSE w[1] END) AS psm_md5,
         |  md5(CASE WHEN n >= 3 THEN concat_ws(' ', '<suf>', $suf, '<pre>', $pre, '<mid>', $mid)
         |      ELSE w[1] END) AS spm_md5
         |FROM d ORDER BY doc_id""".stripMargin
    }

    /** Mirrors [[Corpus.trainingOrder]]: identical md5 keys, ordered
      * hex-prefix range buckets, two-level rank, per-batch manifest.
      */
    def trainingOrder(seed: String = "graft", batchSize: Int = 64): String =
      s"""WITH ${rankCtes(seed, batchSize)}
         |SELECT CAST(batch_id AS BIGINT) AS batch_id,
         |  COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS n_tokens,
         |  CAST(MIN(rank) AS BIGINT) AS first_rank,
         |  md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY rank)) AS order_md5
         |FROM p GROUP BY 1 ORDER BY batch_id""".stripMargin

    /** Mirrors [[Corpus.curriculumOrder]]: textStats quality terciles
      * (rounded quantile_cont cutoffs, the q284 convention), seeded
      * within-phase shuffle via the (phase, bucket) two-level rank.
      */
    def curriculumOrder(seed: String = "graft", batchSize: Int = 64): String = {
      import TextAnalysis.{O => TO}
      s"""WITH s AS (SELECT doc_id, ${TO.textStats} FROM documents),
         |c AS (SELECT round(quantile_cont(quality_score, ${1.0 / 3}), 6) AS c1,
         |        round(quantile_cont(quality_score, ${2.0 / 3}), 6) AS c2 FROM s),
         |d AS (SELECT doc.doc_id, CAST(len(string_split(doc.text, ' ')) AS BIGINT) AS nt,
         |        md5('$seed:' || CAST(doc.doc_id AS VARCHAR)) AS key,
         |        CASE WHEN s.quality_score > c.c2 THEN 0
         |             WHEN s.quality_score > c.c1 THEN 1 ELSE 2 END AS phase
         |      FROM documents doc JOIN s ON s.doc_id = doc.doc_id CROSS JOIN c),
         |b AS (SELECT doc_id, nt, key, phase, substr(key, 1, 2) AS bucket FROM d),
         |wi AS (SELECT doc_id, nt, phase, bucket,
         |    row_number() OVER (PARTITION BY phase, bucket ORDER BY key, doc_id) AS within
         |  FROM b),
         |bs AS (SELECT phase, bucket, COUNT(*) AS bn FROM b GROUP BY 1, 2),
         |bo AS (SELECT phase, bucket, COALESCE(SUM(bn) OVER (ORDER BY phase, bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS boff FROM bs),
         |p AS (SELECT wi.doc_id, wi.nt, wi.phase, bo.boff + wi.within AS rank,
         |        (bo.boff + wi.within - 1) // $batchSize AS batch_id
         |      FROM wi JOIN bo USING (phase, bucket))
         |SELECT CAST(batch_id AS BIGINT) AS batch_id,
         |  COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS n_tokens,
         |  CAST(SUM(CASE WHEN phase = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_head,
         |  CAST(SUM(CASE WHEN phase = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_middle,
         |  CAST(SUM(CASE WHEN phase = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_tail,
         |  CAST(MIN(rank) AS BIGINT) AS first_rank,
         |  md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY rank)) AS order_md5
         |FROM p GROUP BY 1 ORDER BY batch_id""".stripMargin
    }

    /** Mirrors [[Corpus.mixtureInterleave]]: per-source two-level
      * seeded ranks, the progress key, 256 progress-range buckets, and
      * the rounded batch-vs-corpus mix census.
      */
    def mixtureInterleave(seed: String = "graft", batchSize: Int = 64): String =
      s"""WITH d AS (SELECT doc_id, source,
         |    md5('$seed:' || CAST(doc_id AS VARCHAR)) AS key FROM documents),
         |b AS (SELECT doc_id, source, key, substr(key, 1, 2) AS bucket FROM d),
         |wi AS (SELECT doc_id, source, bucket,
         |    row_number() OVER (PARTITION BY source, bucket ORDER BY key, doc_id) AS within
         |  FROM b),
         |so AS (SELECT source, bucket, COALESCE(SUM(bn) OVER (PARTITION BY source
         |    ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS boff
         |  FROM (SELECT source, bucket, COUNT(*) AS bn FROM b GROUP BY 1, 2)),
         |sz AS (SELECT source, COUNT(*) AS ns FROM b GROUP BY 1),
         |k2 AS (SELECT doc_id, source, progress,
         |    least(CAST(floor(progress * 256) AS INT), 255) AS pbucket FROM (
         |    SELECT wi.doc_id, wi.source,
         |      CAST(so.boff + wi.within AS DOUBLE) / sz.ns AS progress
         |    FROM wi JOIN so USING (source, bucket) JOIN sz USING (source))),
         |pw AS (SELECT doc_id, source, pbucket,
         |    row_number() OVER (PARTITION BY pbucket ORDER BY progress, source, doc_id) AS prn
         |  FROM k2),
         |po AS (SELECT pbucket, COALESCE(SUM(pn) OVER (ORDER BY pbucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS poff
         |  FROM (SELECT pbucket, COUNT(*) AS pn FROM k2 GROUP BY 1)),
         |r AS (SELECT pw.doc_id, pw.source, (po.poff + pw.prn - 1) // $batchSize AS batch_id
         |      FROM pw JOIN po USING (pbucket)),
         |t AS (SELECT COUNT(*) AS n_total FROM documents),
         |g AS (SELECT batch_id, source, COUNT(*) AS n_docs FROM r GROUP BY 1, 2),
         |bt AS (SELECT batch_id, SUM(n_docs) AS batch_total FROM g GROUP BY 1)
         |SELECT CAST(g.batch_id AS BIGINT) AS batch_id, g.source, g.n_docs,
         |  round(CAST(g.n_docs AS DOUBLE) / bt.batch_total, 6) AS batch_share,
         |  round(CAST(sz.ns AS DOUBLE) / t.n_total, 6) AS corpus_share,
         |  round(abs(round(CAST(g.n_docs AS DOUBLE) / bt.batch_total, 6)
         |    - round(CAST(sz.ns AS DOUBLE) / t.n_total, 6)), 6) AS abs_dev
         |FROM g JOIN bt USING (batch_id) JOIN sz USING (source) CROSS JOIN t
         |ORDER BY batch_id, source""".stripMargin

    /** Mirrors [[Corpus.noveltyCurve]]: per-doc distinct 3-grams →
      * distinct (batch, gram) → first-batch keyed min → per-batch
      * novelty + the cumulative window over the batch frame.
      */
    def noveltyCurve(seed: String = "graft", batchSize: Int = 64): String =
      s"""WITH ${rankCtes(seed, batchSize)},
         |wl3 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |sh0 AS (SELECT DISTINCT doc_id, sh FROM (
         |         SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
         |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
         |         FROM wl3 WHERE len(w) >= 3) t),
         |dg AS (SELECT DISTINCT p.batch_id, md5(sh) AS gk
         |       FROM sh0 JOIN p USING (doc_id)),
         |fb AS (SELECT gk, MIN(batch_id) AS fb FROM dg GROUP BY gk),
         |pb AS (SELECT batch_id, COUNT(*) AS n_distinct_grams,
         |         CAST(SUM(CASE WHEN batch_id = fb THEN 1 ELSE 0 END) AS BIGINT) AS n_new_grams
         |       FROM dg JOIN fb USING (gk) GROUP BY batch_id),
         |bm AS (SELECT batch_id, COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS n_tokens
         |       FROM p GROUP BY batch_id)
         |SELECT CAST(bm.batch_id AS BIGINT) AS batch_id, bm.n_docs, bm.n_tokens,
         |  COALESCE(pb.n_distinct_grams, 0) AS n_distinct_grams,
         |  COALESCE(pb.n_new_grams, 0) AS n_new_grams,
         |  round(CASE WHEN COALESCE(pb.n_distinct_grams, 0) > 0
         |             THEN CAST(pb.n_new_grams AS DOUBLE) / pb.n_distinct_grams END, 6)
         |    AS novelty_rate,
         |  CAST(SUM(COALESCE(pb.n_new_grams, 0)) OVER (ORDER BY bm.batch_id
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_new_grams
         |FROM bm LEFT JOIN pb USING (batch_id) ORDER BY batch_id""".stripMargin

    def packSequences(tokenBudget: Int = 256): String =
      s"""SELECT source, doc_id, n_tokens,
         |  CAST(cum - n_tokens AS BIGINT) AS start_offset,
         |  CAST(floor((cum - n_tokens) / $tokenBudget) AS BIGINT) AS seq_id,
         |  CAST((cum - n_tokens) % $tokenBudget AS BIGINT) AS offset_in_seq
         |FROM (SELECT source, doc_id, n_tokens,
         |        SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |      FROM (SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
         |            FROM documents))""".stripMargin

    /** Mirrors spanCorruption. DuckDB parity notes: list_position
      * yields 0 for a missing element (like Spark) — test `> 0`, not
      * IS NOT NULL; array_to_string of an EMPTY list yields NULL where
      * Spark's array_join yields '' — COALESCE both strings.
      * list_transform has no index variant, so the target builds from
      * range over anchor indices.
      */
    def spanCorruption(spanLen: Int = 3, stride: Int = 20): String = {
      val phase = s"(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % $stride)"
      val inSpan = s"len(list_filter(anchors, a -> p > a AND p < a + $spanLen)) > 0"
      val sentinelAt = s"'<extra_id_' || CAST(list_position(anchors, p) - 1 AS VARCHAR) || '>'"
      s"""WITH base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |an AS (SELECT doc_id, w, len(w) AS n,
         |         CASE WHEN len(w) >= $spanLen THEN
         |           list_filter(range(1, len(w) - ${spanLen - 2}), p -> p % $stride = $phase)
         |         ELSE [] END AS anchors
         |       FROM base),
         |io AS (SELECT doc_id, n, anchors,
         |         COALESCE(array_to_string(list_filter(
         |           list_transform(range(1, n + 1), p ->
         |             CASE WHEN list_position(anchors, p) > 0 THEN $sentinelAt
         |                  WHEN $inSpan THEN NULL
         |                  ELSE w[p] END),
         |           x -> x IS NOT NULL), ' '), '') AS input_str,
         |         COALESCE(array_to_string(flatten(list_transform(range(1, len(anchors) + 1), k ->
         |           ['<extra_id_' || CAST(k - 1 AS VARCHAR) || '>'] ||
         |             w[anchors[k]:anchors[k] + ${spanLen - 1}])), ' '), '') AS target_str
         |       FROM an)
         |SELECT doc_id, CAST(n AS INT) AS n_words, CAST(len(anchors) AS INT) AS n_spans,
         |  md5(input_str) AS input_md5, md5(target_str) AS target_md5
         |FROM io ORDER BY doc_id""".stripMargin
    }

    /** Mirrors bpeMergePairs (DuckDB range(1, n) is [1, n) — exactly the
      * adjacent-pair start positions; Spark sequence(1, n-1) matches).
      */
    def bpeMergePairs(topK: Int = 30): String =
      s"""WITH vocab AS (SELECT w, COUNT(*) AS wf FROM (
         |  SELECT unnest(string_split(text, ' ')) AS w FROM documents) GROUP BY 1),
         |p AS (SELECT w, wf, unnest(list_transform(range(1, length(w)), i -> substr(w, i, 2))) AS pair
         |      FROM vocab WHERE length(w) > 1),
         |g AS (SELECT pair, CAST(SUM(wf) AS BIGINT) AS pair_count,
         |        CAST(COUNT(DISTINCT w) AS BIGINT) AS n_words FROM p GROUP BY 1)
         |SELECT pair, pair_count, n_words,
         |  CAST(row_number() OVER (ORDER BY pair_count DESC, pair) AS INT) AS rank
         |FROM g ORDER BY pair_count DESC, pair LIMIT $topK""".stripMargin

    def chunkTokens(chunkTokens: Int = 64, stride: Int = 48): String =
      s"""SELECT doc_id,
         |  CAST((start - 1) / $stride AS INT) AS chunk_idx,
         |  CAST(least($chunkTokens, n_tokens - start + 1) AS INT) AS chunk_len,
         |  md5(array_to_string(w[start:least(start + ${chunkTokens - 1}, n_tokens)], ' ')) AS chunk_md5
         |FROM (SELECT doc_id, w, len(w) AS n_tokens,
         |        CAST(unnest(range(1, len(w) + 1, $stride)) AS INT) AS start
         |      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))""".stripMargin
  }
}
