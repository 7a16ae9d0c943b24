package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashes

/** Deterministic content-hash sampling and dataset splitting — the
  * reproducibility primitives a training-data pipeline needs that
  * seeded `df.sample()` cannot give: membership here is a pure function
  * of the row's key, so it is stable across engines, runs, partitionings,
  * cluster sizes, and incremental re-ingestion (a document keeps its
  * split forever, even when the corpus around it changes).
  *
  * Scale design: pure narrow projections/filters (one md5 per row, no
  * shuffle, codegen'd); the filter pushes down past column pruning like
  * any other predicate.
  */
object Sampling {

  val Buckets = 100

  /** Stable bucket in [0, 100) from the md5 of the key. */
  def hashBucket(key: Column): Column =
    Hashes.md5Long32(key.cast("string")) % Buckets

  /** Keep ~keepPct% of rows, selected by key hash (deterministic). */
  def hashSample(df: DataFrame, keyCol: String, keepPct: Int): DataFrame =
    df.withColumn("bucket", hashBucket(col(keyCol)).cast("int"))
      .filter(col("bucket") < keepPct)

  /** Stratified hash sampling: a different deterministic keep-rate per
    * stratum (e.g. downsample boilerplate-heavy sources hard, keep
    * high-quality ones whole — the standard corpus-mixing primitive).
    * Same purity guarantees as hashSample: membership is a function of
    * (key, stratum rate) only — stable across runs, partitionings, and
    * incremental re-ingestion. Narrow projection + filter; no shuffle.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Int], defaultPct: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPct)) { case (els, (s, pct)) =>
      when(col(strataCol) === s, lit(pct)).otherwise(els)
    }
    df.withColumn("bucket", hashBucket(col(keyCol)).cast("int"))
      .withColumn("keep_pct", rate)
      .filter(col("bucket") < col("keep_pct"))
  }

  /** Assign a stable train/val/test split by key hash. */
  def withSplit(df: DataFrame, keyCol: String, trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val b = hashBucket(col(keyCol))
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Deterministic weighted sampling without replacement
    * (Efraimidis–Spirakis A-ES): each row draws u ~ U(0,1) from the md5
    * of its key and scores es_key = −ln(u)/w; the k SMALLEST keys are
    * the weighted sample (a row with twice the weight is twice as
    * likely in). Same purity guarantee as hashSample — membership is a
    * function of (key, weight, k) only — which seeded rand() cannot
    * give across engines/partitionings.
    *
    * Scale: narrow projection + global top-k, which plans as
    * TakeOrderedAndProject (per-partition heaps of k), never a global
    * sort. es_key is rounded at 9 dp before ranking with the key as
    * tiebreak, so both engines rank identical values.
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String, k: Int): DataFrame = {
    val u = (Hashes.md5Long32(col(keyCol).cast("string")) + 1).cast("double") /
      lit(4294967297.0) // (h+1)/(2^32+1) ∈ (0,1), exact numerator
    df.withColumn("es_key", round(-log(u) / col(weightCol).cast("double"), 9))
      .orderBy(col("es_key"), col(keyCol))
      .limit(k)
  }

  /** DuckDB oracle fragments (identical md5 arithmetic). */
  /** Temperature-scaled source sampling weights (p_i ∝ share_i^α, the
    * multilingual-sampling exponent — α < 1 upsamples low-resource
    * sources without flattening the mixture). Input: a docs frame with
    * `source` and `text`; output one row per source with its token
    * share, sampling weight, and upsampling factor (weight/share).
    *
    * Scale: one per-source aggregate (map-side partials), two 1-row
    * broadcast scalars — no data-volume shuffle beyond the token count.
    */
  def temperatureWeights(docs: DataFrame, alpha: Double = 0.7,
      textCol: String = "text"): DataFrame = {
    import graft.functions.{Num, Text}
    val perSource = docs
      .select(col("source"), size(Text.words(col(textCol))).as("toks"))
      .groupBy("source").agg(sum(col("toks").cast("long")).as("tokens"))
    val tot = perSource.agg(sum(col("tokens")).as("total"))
    // share^α via exp(α·ln(share)) — the same two libm calls DuckDB's
    // pow decomposes to — then rounded at 12 dp before normalization so
    // the cross-engine hash contract never rides on a last-ulp pow()
    // divergence (share ∈ (0,1] always: a source present has tokens>0).
    val shares = perSource.crossJoin(broadcast(tot))
      .withColumn("share", col("tokens").cast("double") / col("total"))
      .withColumn("scaled", round(exp(lit(alpha) * log(col("share"))), 12))
    val z = shares.agg(Num.dsumHi(col("scaled")).as("z"))
    shares.crossJoin(broadcast(z))
      .select(col("source"), col("tokens"),
        round(col("share"), 6).as("share"),
        round(col("scaled") / col("z"), 6).as("weight"),
        round(col("scaled") / col("z") / col("share"), 6).as("upsample"))
      .orderBy("source")
  }

  /** Neyman-optimal stratified allocation (Neyman 1934, JRSS): for a
    * fixed total sample budget, the variance-minimizing per-stratum
    * allocation is n_h ∝ N_h·S_h — strata that are BIG or internALLY
    * VARIABLE get more samples; a huge uniform stratum needs few. The
    * "how to spend a labeling/inspection budget" plan the flat
    * hashSample and the share-based temperature mixture cannot give.
    * One aggregation (counts + exact-sum stddevs via Num.dstddev), a
    * 1-row broadcast normalizer; allocations floor-rounded with the
    * remainder reported (`remainder` = budget − Σ n_alloc, replicated
    * per row via an unpartitioned window over the K-strata frame) so
    * budgets stay exact integers. Degenerate corpus guard: if EVERY
    * stratum has zero (or undefined) spread, n_h ∝ N_h·S_h is 0/0 —
    * the allocation falls back to proportional-to-size (n_h ∝ N_h,
    * the classical allocation Neyman reduces to under equal variances),
    * flagged by `proportional_fallback`.
    */
  def neymanAllocation(docs: DataFrame, strataCol: String, valueCol: String,
      budget: Long = 100L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Num
    val st = docs.groupBy(strataCol).agg(
      count(lit(1)).as("n_rows"),
      Num.dstddev(col(valueCol)).as("s"))
      .withColumn("weight", col("n_rows").cast("double") * coalesce(col("s"), lit(0.0)))
    val tot = st.agg(
      sum(col("weight").cast("decimal(38,6)")).cast("double").as("z"),
      sum(col("n_rows")).cast("double").as("ntot"))
    val fallback = col("z") <= 0.0
    val wEff = when(fallback, col("n_rows").cast("double")).otherwise(col("weight"))
    val zEff = when(fallback, col("ntot")).otherwise(col("z"))
    st.crossJoin(broadcast(tot))
      .select(col(strataCol), col("n_rows"),
        round(coalesce(col("s"), lit(0.0)), 6).as("stddev"),
        round(wEff / zEff, 6).as("share"),
        floor(lit(budget.toDouble) * (wEff / zEff)).cast("long").as("n_alloc"),
        fallback.as("proportional_fallback"))
      .withColumn("remainder",
        lit(budget) - sum(col("n_alloc")).over(
          Window.partitionBy().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .orderBy(strataCol)
  }

  /** Decay constant R* of repeated-token value, from the public fit in
    * Muennighoff et al. 2023 ("Scaling Data-Constrained Language
    * Models", NeurIPS): tokens repeated R times past the first epoch
    * are worth U·R*·(1 − e^{−R/R*}) extra effective tokens — the 15th
    * repeat is nearly free of value.
    */
  val RepeatDecay = 15.4

  /** Data-constrained epoch allocation: given a token budget of
    * `budgetMult` true epochs over the DEDUPED corpus, prices two
    * per-source allocation plans through the effective-data law above —
    * NAIVE (∝ raw token share: what a pipeline trains without dedup
    * awareness, silently burning budget on implicit repeats of
    * duplicate-heavy sources) vs DEDUP-AWARE (∝ unique token share:
    * uniform true epochs). The per-source effective-token delta is the
    * planning read: how much training value dedup-aware budgeting buys
    * before anyone trains anything.
    *
    * Scale/determinism: one corpus aggregation joined against the
    * canonical-keep decision list (the q105 operator — unique mass =
    * tokens of kept docs); everything downstream is K-row arithmetic.
    * The one libm call (exp) is rounded at 12 dp before composing (the
    * q152 temperature-mixture discipline), so a DuckDB replay is
    * bit-exact. A source whose every doc lost its cluster election
    * (uniq = 0) prices at zero effective tokens rather than dividing
    * by zero.
    */
  def epochAllocation(docs: DataFrame, budgetMult: Double = 4.0): DataFrame =
    epochAllocationFrom(docs,
      Dedup.canonicalKeep(docs).select(col("doc_id"), col("keep")), budgetMult)

  /** [[epochAllocation]] over an already-computed canonical-keep
    * decision list — the artifact-reuse path (round-15: the inline
    * spelling re-ran pair generation + the component solve the
    * `ngram_cc` Materialized artifact already holds; at corpus scale
    * that is a second full dedup solve for a K-row allocation table).
    */
  def epochAllocationFrom(docs: DataFrame, keptIn: DataFrame,
      budgetMult: Double = 4.0): DataFrame = {
    val toks = TextAnalysis.withTextStats(docs)
      .select(col("doc_id"), col("source"), col("n_tokens"))
    val kept = keptIn.select(col("doc_id"), col("keep"))
    val st = toks.join(kept, "doc_id")
      .groupBy("source")
      .agg(
        sum(col("n_tokens").cast("long")).as("raw_tokens"),
        sum(when(col("keep"), col("n_tokens").cast("long")).otherwise(0L)).as("uniq_tokens"))
    val tot = st.agg(
      sum(col("raw_tokens")).as("traw"), sum(col("uniq_tokens")).as("tuniq"))
    def eff(alloc: Column): Column = {
      val uu = col("uniq_tokens").cast("double")
      val decayed = round(exp(-(alloc / uu - 1.0) / RepeatDecay), 12)
      when(col("uniq_tokens") === 0L, lit(0.0))
        .when(alloc <= uu, alloc)
        .otherwise(uu + uu * RepeatDecay * (lit(1.0) - decayed))
    }
    st.crossJoin(broadcast(tot))
      .withColumn("budget", lit(budgetMult) * col("tuniq").cast("double"))
      .withColumn("naive_alloc",
        col("budget") * col("raw_tokens").cast("double") / col("traw").cast("double"))
      .withColumn("dedup_alloc",
        col("budget") * col("uniq_tokens").cast("double") / col("tuniq").cast("double"))
      .withColumn("en", eff(col("naive_alloc")))
      .withColumn("ed", eff(col("dedup_alloc")))
      .select(col("source"), col("raw_tokens"), col("uniq_tokens"),
        round(col("raw_tokens").cast("double")
          / greatest(col("uniq_tokens"), lit(1L)).cast("double"), 6).as("dup_ratio"),
        round(col("naive_alloc"), 6).as("naive_alloc"),
        when(col("uniq_tokens") > 0,
          round(col("naive_alloc") / col("uniq_tokens").cast("double") - 1.0, 6))
          .as("naive_repeats"),
        round(col("en"), 6).as("naive_eff_tokens"),
        round(col("dedup_alloc"), 6).as("dedup_alloc"),
        round(col("ed"), 6).as("dedup_eff_tokens"),
        round(col("ed") - col("en"), 6).as("eff_gain"))
      .orderBy("source")
  }

  /** Domain-mixture reweighting by excess loss — the DoReMi shape (Xie
    * et al. 2023, NeurIPS — "DoReMi: Optimizing Data Mixtures Speeds Up
    * Language Model Pretraining") with the linearized multiplicative-
    * weights update w ← w·(1 + η·excess) (the (1+εm) Hedge variant,
    * Arora/Hazan/Kale 2012 survey) in place of exp(η·excess):
    * underperforming domains (per-source mean quality below the corpus
    * mean — the excess-loss proxy) are upweighted multiplicatively,
    * renormalized, and smoothed toward uniform by δ each round, starting
    * from the token-share base mixture.
    *
    * Scale/determinism contract (the q171 classifier discipline): the
    * per-source stats frame is ONE aggregation over the corpus
    * (map-side partials, decimal-backed quality sums), cached at K
    * rows; each of the `iters` rounds is two tiny jobs on that K-row
    * frame with only the K-entry weight vector round-tripping through
    * the driver as literals; every float step is engine-computed,
    * rounded at 12 dp, and the normalizer is a LEFT FOLD over the
    * source-sorted weight list — order-pinned, so a DuckDB replay of
    * the whole trajectory is bit-exact.
    */
  def doremiWeights(docs: DataFrame, eta: Double = 0.5, delta: Double = 0.1,
      iters: Int = 10): DataFrame = {
    import graft.functions.Num
    val scored = TextAnalysis.withTextStats(docs)
      .select(col("source"), col("n_tokens"), col("quality_score"))
    val corpus = scored.agg(
      (Num.dsumHi(col("quality_score")) / count(lit(1)).cast("double")).as("cavg"))
    val ttot = scored.agg(sum(col("n_tokens").cast("long")).as("ttot"))
    val stats = scored.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("tokens"),
        (Num.dsumHi(col("quality_score")) / count(lit(1)).cast("double")).as("avgq"))
      .crossJoin(broadcast(corpus)).crossJoin(broadcast(ttot))
      .select(col("source"), col("n_docs"), col("tokens"),
        round(greatest(lit(0.0), col("cavg") - col("avgq")), 12).as("excess"),
        round(col("tokens").cast("double") / col("ttot").cast("double"), 12).as("w0"))
      .cache()
    // The per-round weight vector rides a broadcast (source, w) frame
    // joined by key instead of a per-source when()-literal chain: with
    // literals every round re-optimized and janino-recompiled a fresh
    // plan (~0.3 s/round of pure driver latency at any scale — the
    // Classifier.fit lesson); as a joined column the plan is identical
    // across rounds and the codegen cache hits. Same per-source doubles
    // either way (a keyed lookup, not arithmetic) — trajectory
    // unchanged, oracle re-verified.
    def wFrame(w: Map[String, Double]): DataFrame = {
      val spark = stats.sparkSession
      import spark.implicits._
      w.toSeq.sortBy(_._1).toDF("source", "w_in")
    }
    def joined(w: Map[String, Double]) =
      stats.join(broadcast(wFrame(w)), Seq("source"))
    var w: Map[String, Double] = stats.select("source", "w0").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (_ <- 1 to iters) {
      val wp = joined(w).select(col("source"),
        round(col("w_in") * (lit(1.0) + lit(eta) * col("excess")), 12).as("wp"))
      val norm = wp.agg(
        aggregate(array_sort(collect_list(struct(col("source"), col("wp")))),
          lit(0.0), (a, x) => a + x.getField("wp")).as("nrm"),
        count(lit(1)).cast("double").as("kk"))
      w = wp.crossJoin(broadcast(norm))
        .select(col("source"),
          round((lit(1.0) - lit(delta)) * (col("wp") / col("nrm")) +
            lit(delta) / col("kk"), 12).as("w"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    }
    joined(w).select(col("source"), col("n_docs"), col("tokens"),
        round(col("w0"), 6).as("base_share"),
        round(col("excess"), 6).as("excess"),
        round(col("w_in"), 6).as("weight"),
        round(col("w_in") / col("w0"), 6).as("boost"))
      .orderBy("source")
  }

  /** Deterministic SYSTEMATIC resampling with replacement — the
    * particle-filter / data-mixture standard: k draws exactly
    * proportional to weight, zero variance, zero randomness. The
    * quality-weighted cumulative share axis is cut at k equally spaced
    * thresholds; doc i receives floor(shareᵢ·k) − floor(shareᵢ₋₁·k)
    * copies, so Σ copies = k exactly and every doc's copy count is
    * within 1 of its exact expectation — the with-replacement
    * extension of this file's pure-function membership discipline
    * (seeded rand() gives neither the proportionality nor the
    * replayability).
    *
    * Engine-exactness: weights round to 6 dp and accumulate as exact
    * decimals via the two-level prefix sum (per-bucket keyed windows +
    * the tiny bucket-offset frame — never a corpus-wide
    * single-partition window); shares round to 12 dp before the floor,
    * so the grid cut is the same IEEE double in both engines.
    */
  def systematicResample(docs: DataFrame, k: Int = 100): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val w6 = TextAnalysis.withTextStats(docs)
      .select(col("doc_id"),
        round(col("quality_score"), 6).cast("decimal(38,6)").as("w"))
      .withColumn("bucket", expr("doc_id div 100"))
    val wIn = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wB = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    val boff = w6.groupBy("bucket").agg(sum(col("w")).as("bt"))
      .withColumn("boff",
        coalesce(sum(col("bt")).over(wB), lit(0).cast("decimal(38,6)")))
      .select("bucket", "boff")
    val tot = w6.agg(sum(col("w")).as("tw"))
    val share = round((col("boff") + col("cw")).cast("double") / col("tw").cast("double"), 12)
    val sharePrev =
      round((col("boff") + col("cw") - col("w")).cast("double") / col("tw").cast("double"), 12)
    w6.withColumn("cw", sum(col("w")).over(wIn))
      .join(broadcast(boff), "bucket")
      .crossJoin(broadcast(tot))
      .withColumn("n_copies", floor(share * k) - floor(sharePrev * k))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("w").cast("double").as("weight"), col("n_copies"))
      .orderBy("doc_id")
  }

  /** Mixture diversity census over the corpus token mass, one row per
    * grouping dimension (source, lang): group count, Shannon entropy
    * (nats) with its effective group number, Simpson concentration with
    * its inverse, and the Gini coefficient of the token-mass
    * distribution — the standard "how balanced is my mixture" report a
    * pretraining recipe is judged by. Shannon/Simpson terms ride the
    * 18-dp decimal-backed sum (order-independent, engine-identical);
    * Gini's Σ i·x_i is INTEGER-exact over ranks assigned by the
    * deterministic (mass, group) ordering. One groupBy per dimension,
    * then windows over the tiny group frame (#sources/#langs rows) —
    * never over documents.
    */
  def diversityCensus(docs: DataFrame, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.{Num, Text}
    val tok = docs.select(col("source"), col("lang"),
      size(Text.words(col(textCol))).cast("long").as("nt"))
    def byDim(dim: String): DataFrame =
      tok.groupBy(col(dim).as("grp")).agg(sum(col("nt")).as("x"))
        .withColumn("dim", lit(dim))
    val wOrd = Window.partitionBy("dim").orderBy(col("x"), col("grp"))
    val wAll = Window.partitionBy("dim")
    byDim("source").unionByName(byDim("lang"))
      .withColumn("i", row_number().over(wOrd))
      .withColumn("tx", sum(col("x")).over(wAll))
      .withColumn("p", col("x").cast("double") / col("tx"))
      .groupBy("dim")
      .agg(
        count(lit(1)).as("n_groups"),
        sum(col("x")).as("n_tokens"),
        (-Num.dsumHi(col("p") * log(col("p")))).as("sh"),
        Num.dsumHi(col("p") * col("p")).as("si"),
        sum(col("i") * col("x")).as("sx"))
      .select(col("dim"), col("n_groups"), col("n_tokens"),
        round(col("sh"), 6).as("shannon"),
        round(exp(col("sh")), 6).as("eff_groups"),
        round(col("si"), 6).as("simpson"),
        round(lit(1.0) / col("si"), 6).as("inv_simpson"),
        round(lit(2.0) * col("sx") / (col("n_groups") * col("n_tokens"))
          - (col("n_groups") + lit(1)).cast("double") / col("n_groups"), 6).as("gini"))
      .orderBy("dim")
  }

  object O {
    /** Unrolled-CTE replay of [[doremiWeights]] — one (wp, norm, w)
      * CTE triple per round, same fold-sum, same 12-dp trajectory.
      */
    def doremiWeights(eta: Double = 0.5, delta: Double = 0.1,
        iters: Int = 10): String = {
      import TextAnalysis.{O => TO}
      val head =
        s"""WITH s AS MATERIALIZED (SELECT source, ${TO.textStats} FROM documents),
           |agg AS MATERIALIZED (SELECT source, COUNT(*) AS n_docs,
           |    CAST(SUM(CAST(n_tokens AS BIGINT)) AS BIGINT) AS tokens,
           |    CAST(SUM(CAST(quality_score AS DECIMAL(38,18))) AS DOUBLE)
           |      / CAST(COUNT(*) AS DOUBLE) AS avgq
           |  FROM s GROUP BY 1),
           |c0 AS (SELECT CAST(SUM(CAST(quality_score AS DECIMAL(38,18))) AS DOUBLE)
           |         / CAST(COUNT(*) AS DOUBLE) AS cavg FROM s),
           |tt AS (SELECT CAST(SUM(tokens) AS BIGINT) AS ttot FROM agg),
           |it0 AS (SELECT source, n_docs, tokens,
           |    round(greatest(0.0, cavg - avgq), 12) AS excess,
           |    round(CAST(tokens AS DOUBLE) / CAST(ttot AS DOUBLE), 12) AS w0,
           |    round(CAST(tokens AS DOUBLE) / CAST(ttot AS DOUBLE), 12) AS w
           |  FROM agg CROSS JOIN c0 CROSS JOIN tt)""".stripMargin
      val its = (1 to iters).map { i =>
        s"""p$i AS (SELECT source, n_docs, tokens, excess, w0,
           |    round(w * (1.0 + $eta * excess), 12) AS wp FROM it${i - 1}),
           |n$i AS (SELECT list_reduce(list_prepend(0.0, list(wp ORDER BY source)),
           |      (a, b) -> a + b) AS nrm,
           |    CAST(COUNT(*) AS DOUBLE) AS kk FROM p$i),
           |it$i AS (SELECT source, n_docs, tokens, excess, w0,
           |    round((1.0 - $delta) * (wp / nrm) + $delta / kk, 12) AS w
           |  FROM p$i CROSS JOIN n$i)""".stripMargin
      }
      val tail =
        s"""SELECT source, n_docs, tokens, round(w0, 6) AS base_share,
           |  round(excess, 6) AS excess, round(w, 6) AS weight,
           |  round(w / w0, 6) AS boost
           |FROM it$iters ORDER BY source""".stripMargin
      (Seq(head) ++ its).mkString(",\n") + "\n" + tail
    }

    def hashBucket(key: String): String =
      s"(${Hashes.O.md5Long32(s"CAST($key AS VARCHAR)")} % $Buckets)"
    def esKey(key: String, weight: String): String =
      s"round(-ln((${Hashes.O.md5Long32(s"CAST($key AS VARCHAR)")} + 1) / 4294967297.0) / CAST($weight AS DOUBLE), 9)"
    def strataRate(strataCol: String, rates: Map[String, Int], defaultPct: Int): String =
      rates.toSeq.sortBy(_._1)
        .map { case (s, pct) => s"WHEN $strataCol = '$s' THEN $pct" }
        .mkString("CASE ", " ", s" ELSE $defaultPct END")
    def split(key: String, trainPct: Int = 80, valPct: Int = 10): String =
      s"""CASE WHEN ${hashBucket(key)} < $trainPct THEN 'train'
         |     WHEN ${hashBucket(key)} < ${trainPct + valPct} THEN 'val'
         |     ELSE 'test' END""".stripMargin

    /** Mirrors [[Sampling.systematicResample]]: 6-dp decimal weights,
      * exact decimal cumulative sum (the two-level Spark split and this
      * single window are value-identical — decimal addition is exact),
      * 12-dp share rounding before the floor-grid cut.
      */
    def systematicResample(k: Int = 100): String = {
      import TextAnalysis.{O => TO}
      s"""WITH s AS (SELECT doc_id, ${TO.textStats} FROM documents),
         |w AS (SELECT doc_id, CAST(round(quality_score, 6) AS DECIMAL(38,6)) AS w FROM s),
         |t AS (SELECT CAST(SUM(w) AS DECIMAL(38,6)) AS tw FROM w),
         |c AS (SELECT doc_id, w,
         |        SUM(w) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM w),
         |g AS (SELECT doc_id, w,
         |        round(CAST(cum AS DOUBLE) / CAST(tw AS DOUBLE), 12) AS sh,
         |        round(CAST(cum - w AS DOUBLE) / CAST(tw AS DOUBLE), 12) AS shp
         |      FROM c CROSS JOIN t)
         |SELECT doc_id, CAST(w AS DOUBLE) AS weight,
         |  CAST(floor(sh * $k) - floor(shp * $k) AS BIGINT) AS n_copies
         |FROM g
         |WHERE floor(sh * $k) - floor(shp * $k) > 0
         |ORDER BY doc_id""".stripMargin
    }

    /** Mirrors [[Sampling.diversityCensus]]: identical rank ordering,
      * 18-dp decimal sums for the entropy/concentration terms,
      * integer-exact Σ i·x_i for Gini.
      */
    def diversityCensus(): String = {
      import graft.functions.Num
      val p = "(CAST(x AS DOUBLE) / tx)"
      s"""WITH tok AS (SELECT source, lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt FROM documents),
         |g AS (SELECT 'source' AS dim, source AS grp, CAST(SUM(nt) AS BIGINT) AS x
         |      FROM tok GROUP BY 2
         |      UNION ALL
         |      SELECT 'lang', lang, CAST(SUM(nt) AS BIGINT) FROM tok GROUP BY 2),
         |r AS (SELECT dim, grp, x,
         |        row_number() OVER (PARTITION BY dim ORDER BY x, grp) AS i,
         |        SUM(x) OVER (PARTITION BY dim) AS tx
         |      FROM g),
         |a AS (SELECT dim, COUNT(*) AS n_groups, CAST(SUM(x) AS BIGINT) AS n_tokens,
         |        -${Num.O.sumHi(s"$p * ln($p)")} AS sh,
         |        ${Num.O.sumHi(s"$p * $p")} AS si,
         |        CAST(SUM(i * x) AS BIGINT) AS sx
         |      FROM r GROUP BY dim)
         |SELECT dim, n_groups, n_tokens,
         |  round(sh, 6) AS shannon, round(exp(sh), 6) AS eff_groups,
         |  round(si, 6) AS simpson, round(1.0 / si, 6) AS inv_simpson,
         |  round(2.0 * sx / (n_groups * n_tokens)
         |    - CAST(n_groups + 1 AS DOUBLE) / n_groups, 6) AS gini
         |FROM a ORDER BY dim""".stripMargin
    }
  }

  /** Greedy quality-ranked selection under a per-source token budget —
    * the "fill the budget with the best documents" curation step: rank
    * each source's docs by (quality DESC, doc_id), take the prefix
    * whose cumulative token count fits `budgetFrac` of the source's
    * tokens, and report the funnel (selected counts/tokens and the
    * quality cutoff — the price of the budget).
    *
    * Scale design: the ranking is a per-SOURCE window (a trillion-token
    * corpus selects in parallel across sources), budgets are a
    * broadcast per-source table, and every statistic is an exact
    * integer until the one rounded cutoff column. Ordering is total
    * (doc_id tie-break) so the selected set is engine-exact.
    */
  def budgetSelection(docs: DataFrame, budgetFrac: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stats = TextAnalysis.withTextStats(docs)
      .select(col("doc_id"), col("source"),
        col("n_tokens").cast("long").as("toks"), col("quality_score"))
    val budgets = stats.groupBy("source").agg(sum(col("toks")).as("total_toks"))
      .withColumn("budget",
        floor(col("total_toks").cast("double") * budgetFrac).cast("long"))
      .select("source", "budget")
    val w = Window.partitionBy("source")
      .orderBy(desc("quality_score"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    stats.join(broadcast(budgets), "source")
      .withColumn("cum", sum(col("toks")).over(w))
      .withColumn("selected", col("cum") <= col("budget"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("selected"), 1L).otherwise(0L)).as("n_selected"),
        max(col("budget")).as("budget"),
        sum(when(col("selected"), col("toks")).otherwise(0L)).as("tokens_selected"),
        min(when(col("selected"), round(col("quality_score"), 6))).as("quality_cutoff"))
  }
}
