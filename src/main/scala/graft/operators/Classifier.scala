package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Num

/** In-engine trained logistic-regression domain classifier — the
  * fastText-style linear filter CCNet/DSIR-era pipelines train to score
  * "does this document look like the target domain?", expressed entirely
  * as Spark aggregates (no MLlib, no driver-side data).
  *
  * Batch gradient descent: each iteration is ONE map-side-combined
  * aggregation over the (cached) feature frame — four decimal-backed
  * gradient sums — and the 4-weight model round-trips through the
  * driver as plain literals. At 100 TB that is `iters` scans of a
  * 4-column projection with partial aggregation; no shuffle of data
  * rows, no collect of anything but the 1-row weight vector.
  *
  * Determinism (the DuckDB oracle replays the identical trajectory):
  *  - the sigmoid is the algebraic approximation
  *    s(z) = 0.5 + 0.5·z/(1+|z|) — only +, −, ×, ÷, abs, all IEEE
  *    correctly-rounded, so both engines produce bit-identical
  *    per-row terms (no libm exp dependence);
  *  - gradient sums are DECIMAL(38,18)-backed (order/partitioning
  *    independent);
  *  - weights are rounded to 12 dp after every step, keeping the whole
  *    trajectory representable in the oracle's unrolled CTE chain.
  */
object Classifier {

  val Lr = 0.5
  val Iters = 12

  /** Per-doc capped feature vector from the verified q49 token stats,
    * plus the binary domain label.
    */
  def features(docs: DataFrame, labelPred: Column): DataFrame =
    TextAnalysis.withTextStats(docs)
      .select(
        col("doc_id"),
        least(col("n_tokens") / lit(200.0), lit(1.0)).as("x1"),
        least(col("avg_token_len") / lit(8.0), lit(1.0)).as("x2"),
        least(col("stopword_ratio") * lit(2.0), lit(1.0)).as("x3"),
        when(labelPred, lit(1.0)).otherwise(lit(0.0)).as("y"))

  /** Hardware-friendly sigmoid: exact arithmetic on both engines. */
  private def sigmoid(z: Column): Column =
    lit(0.5) + lit(0.5) * z / (lit(1.0) + abs(z))

  private def z(w: Array[Double]): Column =
    lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") + lit(w(3)) * col("x3")

  /** The GD loop over a cached feature frame: `iters` aggregations, a
    * 1-row weight vector round-tripping through the driver.
    *
    * PER-ITERATION PLAN REUSE (round-15 optimization, guide §1.2 "per-
    * task work"): the weights are fed back as a BROADCAST 1-ROW FRAME,
    * not as literals. Primitive literals are inlined into the generated
    * code, so literal weights forced a janino recompile of the whole
    * gradient-aggregation plan every iteration — ~0.35 s/iteration of
    * pure driver latency at ANY data scale (measured: 0.63 s/iter with
    * literals vs 0.30 s/iter with broadcast columns, 5-fold cv, sf0.1).
    * As broadcast columns the generated source is byte-identical across
    * iterations and the codegen cache hits. The arithmetic is the same
    * IEEE ops on the same doubles (no constant folding existed to lose:
    * every weight multiplies a column), so the trajectory is
    * bit-identical — profiled 12 iterations × 5 folds equal, and the
    * DuckDB oracle re-verifies every consumer query.
    */
  private def wCol(j: Int): Column = col(s"_wp_$j")

  private def weightFrame(f: DataFrame, flat: Seq[Double]): DataFrame =
    f.sparkSession.range(1)
      .select(flat.indices.map(j => lit(flat(j)).as(s"_wp_$j")): _*)

  private def fit(f: DataFrame, lr: Double, iters: Int): Array[Double] = {
    val n = count(lit(1)).cast("double")
    val zc = wCol(0) + wCol(1) * col("x1") + wCol(2) * col("x2") + wCol(3) * col("x3")
    val err = sigmoid(zc) - col("y")
    val aggs = Seq(
      round(max(wCol(0)) - lit(lr) * (Num.dsumHi(err) / n), 12).as("b"),
      round(max(wCol(1)) - lit(lr) * (Num.dsumHi(err * col("x1")) / n), 12).as("w1"),
      round(max(wCol(2)) - lit(lr) * (Num.dsumHi(err * col("x2")) / n), 12).as("w2"),
      round(max(wCol(3)) - lit(lr) * (Num.dsumHi(err * col("x3")) / n), 12).as("w3"))
    var w = Array(0.0, 0.0, 0.0, 0.0) // bias, w1, w2, w3
    for (_ <- 1 to iters) {
      val row = f.crossJoin(broadcast(weightFrame(f, w.toSeq)))
        .agg(aggs.head, aggs.tail: _*)
        .head()
      // an empty training frame (count 0) nulls every gradient — fail
      // with the real cause instead of a getDouble NPE downstream
      require(!row.isNullAt(0),
        "empty training set: the trainPct hash sample selected no rows")
      w = Array(row.getDouble(0), row.getDouble(1), row.getDouble(2), row.getDouble(3))
    }
    w
  }

  /** Several GD models with DIFFERENT training predicates (folds,
    * nested fractions) fit simultaneously over ONE cached frame:
    * each iteration is a single aggregation carrying every model's
    * conditional gradient sums — `when(pred, term).otherwise(0)` adds
    * exact decimal zeros, so each trajectory is BIT-IDENTICAL to a
    * filtered solo [[fit]] while `iters` scans replace models×iters.
    */
  private def fitMany(f: DataFrame, preds: Seq[Column], lr: Double,
      iters: Int, names: Seq[String] = Nil): Seq[Array[Double]] = {
    // one predicate selecting ZERO rows of a non-empty frame would make
    // that model's gradients 0/0 = NaN and its weights silently NaN
    // (while the oracle's GROUP BY over the empty train CTE emits no
    // rows at all — a silent divergence); fail naming the culprit
    val nRow = f.agg(
      sum(when(preds.head, 1L).otherwise(0L)),
      preds.tail.map(p => sum(when(p, 1L).otherwise(0L))): _*).head()
    preds.indices.foreach { i =>
      require(!nRow.isNullAt(i) && nRow.getLong(i) > 0,
        s"empty training set for model ${if (names.isDefinedAt(i)) names(i) else i.toString}: " +
          "its predicate selects no rows")
    }
    // Weights ride a broadcast 1-row frame so the multi-model gradient
    // plan compiles ONCE for all iterations — see [[fit]].
    val aggs = preds.zipWithIndex.flatMap { case (pred, i) =>
      def w(j: Int) = wCol(4 * i + j)
      val zc = w(0) + w(1) * col("x1") + w(2) * col("x2") + w(3) * col("x3")
      val err = sigmoid(zc) - col("y")
      val n = sum(when(pred, 1L).otherwise(0L)).cast("double")
      def g(t: Column) = Num.dsumHi(when(pred, t).otherwise(lit(0.0)))
      Seq(
        round(max(w(0)) - lit(lr) * (g(err) / n), 12).as(s"b_$i"),
        round(max(w(1)) - lit(lr) * (g(err * col("x1")) / n), 12).as(s"w1_$i"),
        round(max(w(2)) - lit(lr) * (g(err * col("x2")) / n), 12).as(s"w2_$i"),
        round(max(w(3)) - lit(lr) * (g(err * col("x3")) / n), 12).as(s"w3_$i"))
    }
    var ws: Seq[Array[Double]] = preds.map(_ => Array(0.0, 0.0, 0.0, 0.0))
    for (_ <- 1 to iters) {
      val row = f.crossJoin(broadcast(weightFrame(f, ws.flatten)))
        .agg(aggs.head, aggs.tail: _*)
        .head()
      require(!row.isNullAt(0), "empty training set in multi-model fit")
      ws = preds.indices.map(i => Array(
        row.getDouble(4 * i), row.getDouble(4 * i + 1),
        row.getDouble(4 * i + 2), row.getDouble(4 * i + 3)))
    }
    ws
  }

  /** The deterministic hash-sampled training subset (the IVF quantizer
    * discipline): at corpus scale the GD loop touches only ~trainPct%
    * of rows while evaluation still covers everything.
    */
  private def trainSet(f: DataFrame, trainPct: Int): DataFrame =
    if (trainPct >= 100) f
    else f.filter(Sampling.hashBucket(col("doc_id")).cast("int") < trainPct)

  /** Trains (on the full frame, or a hash sample when trainPct < 100),
    * returns ONE row: the final weights, the class balance, the
    * confusion counts at the z >= 0 decision boundary over the FULL
    * frame, and accuracy.
    */
  def trainDomainClassifier(docs: DataFrame, labelPred: Column,
      lr: Double = Lr, iters: Int = Iters, trainPct: Int = 100): DataFrame = {
    val f = features(docs, labelPred).cache()
    val w = fit(trainSet(f, trainPct), lr, iters)
    val predPos = z(w) >= lit(0.0)
    val isPos = col("y") === lit(1.0)
    f.agg(
        count(lit(1)).as("n_docs"),
        sum(col("y").cast("long")).as("n_pos"),
        sum(when(predPos && isPos, 1L).otherwise(0L)).as("tp"),
        sum(when(predPos && !isPos, 1L).otherwise(0L)).as("fp"),
        sum(when(!predPos && !isPos, 1L).otherwise(0L)).as("tn"),
        sum(when(!predPos && isPos, 1L).otherwise(0L)).as("fn"))
      .withColumn("iters", lit(iters))
      .withColumn("w_bias", lit(w(0)))
      .withColumn("w1", lit(w(1)))
      .withColumn("w2", lit(w(2)))
      .withColumn("w3", lit(w(3)))
      .withColumn("accuracy",
        round((col("tp") + col("tn")).cast("double") / col("n_docs"), 6))
      .select("iters", "w_bias", "w1", "w2", "w3", "n_docs", "n_pos",
        "tp", "fp", "tn", "fn", "accuracy")
  }

  /** The filter pass itself: every document scored under the trained
    * model — σ̂(z) in [0, 1] plus the z >= 0 keep flag. Training reuses
    * the cached feature frame; scoring is one more narrow projection
    * over it (at 100 TB: iters + 1 scans, zero shuffles).
    */
  def scoreDocuments(docs: DataFrame, labelPred: Column,
      lr: Double = Lr, iters: Int = Iters, trainPct: Int = 100): DataFrame = {
    val f = features(docs, labelPred).cache()
    val w = fit(trainSet(f, trainPct), lr, iters)
    f.select(col("doc_id"), col("y").cast("int").as("label"),
        round(sigmoid(z(w)), 6).as("score"),
        (z(w) >= lit(0.0)).as("predicted_positive"))
      .orderBy("doc_id")
  }

  /** The online-scoring half of the offline-train / online-score split:
    * apply ALREADY-TRAINED weights as plan literals. Stateless and
    * narrow, so it runs unchanged on a streaming frame (see
    * streaming.StreamCuration) — no label column required.
    */
  def withScore(docs: DataFrame, w: Array[Double]): DataFrame = {
    require(w.length == 4, s"expected (bias, w1, w2, w3), got ${w.length} weights")
    TextAnalysis.withTextStats(docs)
      .withColumn("x1", least(col("n_tokens") / lit(200.0), lit(1.0)))
      .withColumn("x2", least(col("avg_token_len") / lit(8.0), lit(1.0)))
      .withColumn("x3", least(col("stopword_ratio") * lit(2.0), lit(1.0)))
      .withColumn("domain_score", round(sigmoid(z(w)), 6))
      .withColumn("keep_domain", z(w) >= lit(0.0))
  }

  /** k-fold cross-validation of the domain classifier: disjoint
    * hash-bucket folds, each fold's model trained on the other k−1
    * (the full GD trajectory) and scored on its own — the
    * model-selection read that prices variance across resamples, not
    * just one split. One cached feature frame; k trajectories of
    * `iters` aggregations each; per fold the eval confusion at the
    * z >= 0 boundary. The oracle replays all k trajectories in one
    * WITH clause (fold-prefixed CTE names).
    */
  def crossValidate(docs: DataFrame, labelPred: Column, folds: Int = 5,
      lr: Double = Lr, iters: Int = Iters): DataFrame = {
    require(folds > 1 && 100 % folds == 0, "folds must divide the 100 hash buckets")
    val span = 100 / folds
    val f = features(docs, labelPred)
      .withColumn("bkt", Sampling.hashBucket(col("doc_id")).cast("int")).cache()
    def evalPred(k: Int) = col("bkt") >= k * span && col("bkt") < (k + 1) * span
    val ws = fitMany(f, (0 until folds).map(k => !evalPred(k)), lr, iters,
      (0 until folds).map(k => s"fold $k"))
    val rows = (0 until folds).map { k =>
      val w = ws(k)
      val predPos = z(w) >= lit(0.0)
      val isPos = col("y") === lit(1.0)
      // the fold constant attaches OUTSIDE the aggregation: max(lit(k))
      // over an empty eval split returns NULL where the oracle's
      // `SELECT $k AS fold` returns the constant
      f.filter(evalPred(k)).agg(
          count(lit(1)).as("n_eval"),
          sum(when(predPos && isPos, 1L).otherwise(0L)).as("tp"),
          sum(when(predPos && !isPos, 1L).otherwise(0L)).as("fp"),
          sum(when(!predPos && !isPos, 1L).otherwise(0L)).as("tn"),
          sum(when(!predPos && isPos, 1L).otherwise(0L)).as("fn"))
        .withColumn("fold", lit(k))
        .withColumn("accuracy",
          round((col("tp") + col("tn")).cast("double") / col("n_eval"), 6))
        .select("fold", "n_eval", "tp", "fp", "tn", "fn", "accuracy")
    }
    rows.reduce(_ unionByName _).orderBy("fold")
  }

  /** Learning curve: the classifier retrained at increasing training
    * fractions (hash-bucket prefixes — each training set CONTAINS the
    * smaller ones, the honest curve) and scored on one fixed held-out
    * split (buckets [80, 100)). Flat accuracy past a fraction = more
    * data won't help this model; still-rising = collect more. Same
    * engine discipline as [[crossValidate]].
    */
  def learningCurve(docs: DataFrame, labelPred: Column,
      trainPcts: Seq[Int] = Seq(10, 20, 40, 80),
      lr: Double = Lr, iters: Int = Iters): DataFrame = {
    require(trainPcts.forall(p => p > 0 && p <= 80), "train fractions must fit below the eval split")
    val f = features(docs, labelPred)
      .withColumn("bkt", Sampling.hashBucket(col("doc_id")).cast("int")).cache()
    val eval = f.filter(col("bkt") >= 80)
    val ws = fitMany(f, trainPcts.map(pct => col("bkt") < pct), lr, iters,
      trainPcts.map(pct => s"train fraction $pct%"))
    val rows = trainPcts.zip(ws).map { case (pct, w) =>
      val predPos = z(w) >= lit(0.0)
      val isPos = col("y") === lit(1.0)
      // constant attached outside the aggregation (see crossValidate)
      eval.agg(
          count(lit(1)).as("n_eval"),
          sum(when(predPos && isPos, 1L).otherwise(0L)).as("tp"),
          sum(when(predPos && !isPos, 1L).otherwise(0L)).as("fp"),
          sum(when(!predPos && !isPos, 1L).otherwise(0L)).as("tn"),
          sum(when(!predPos && isPos, 1L).otherwise(0L)).as("fn"))
        .withColumn("train_pct", lit(pct))
        .withColumn("accuracy",
          round((col("tp") + col("tn")).cast("double") / col("n_eval"), 6))
        .select("train_pct", "n_eval", "tp", "fp", "tn", "fn", "accuracy")
    }
    rows.reduce(_ unionByName _).orderBy("train_pct")
  }

  /** Split-conformal calibration of the domain classifier (Vovk et al.
    * 2005, "Algorithmic Learning in a Random World"; Papadopoulos 2002
    * inductive variant): train on the first 60 hash-buckets, take the
    * ⌈(1−ε)(n+1)⌉-th smallest NEGATIVE score on the calibration
    * buckets [60, 80) as the alarm threshold, and report empirical
    * FPR/recall on the held-out buckets [80, 100). Exchangeability
    * gives the distribution-free guarantee P(negative scores above
    * threshold) ≤ ε — a calibrated "how often does the domain filter
    * wrongly keep an off-domain doc" knob, with no model assumptions.
    *
    * Scale design: scoring is the [[scoreDocuments]] path (iters + 1
    * corpus scans); the calibration quantile runs over the DISTINCT
    * rounded scores (≤10⁶ rows by construction — scores are 6-dp in
    * [0,1] — so the single-group cumulative window is bounded, never
    * data-sized); eval metrics are one aggregation with the threshold
    * broadcast.
    */
  def conformalGate(docs: DataFrame, labelPred: Column, eps: Double = 0.1,
      lr: Double = Lr, iters: Int = Iters): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = scoreDocuments(docs, labelPred, lr, iters, trainPct = 60)
      .withColumn("b", Sampling.hashBucket(col("doc_id")).cast("int"))
    val cal = scored.filter(col("b") >= 60 && col("b") < 80 && col("label") === 0)
    val nRow = cal.agg(count(lit(1)).as("n_cal_neg"))
    val wCum = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val thrRow = cal.groupBy("score").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wCum))
      .crossJoin(broadcast(nRow))
      .filter(col("cum") >= ceil(lit(1.0 - eps) * (col("n_cal_neg") + 1).cast("double")))
      .agg(min(col("score")).as("threshold"))
    scored.filter(col("b") >= 80)
      .crossJoin(broadcast(thrRow)).crossJoin(broadcast(nRow))
      .agg(
        max(lit(eps)).as("epsilon"),
        max(col("n_cal_neg")).as("n_cal_neg"),
        max(col("threshold")).as("threshold"),
        sum(when(col("label") === 1, 1L).otherwise(0L)).as("n_eval_pos"),
        sum(when(col("label") === 0, 1L).otherwise(0L)).as("n_eval_neg"),
        sum(when(col("label") === 1 && col("score") > col("threshold"), 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("label") === 0 && col("score") > col("threshold"), 1L)
          .otherwise(0L)).as("fp"))
      .withColumn("recall",
        round(col("tp").cast("double") / col("n_eval_pos").cast("double"), 6))
      .withColumn("empirical_fpr",
        round(col("fp").cast("double") / col("n_eval_neg").cast("double"), 6))
  }

  /** Exact ROC-AUC of a scored frame ([[scoreDocuments]] output shape:
    * `label` 0/1, `score`), computed as the Mann–Whitney U statistic
    * with the standard average-rank tie treatment:
    * AUC = [Σ_g p_g·(#neg below g) + ½·Σ_g p_g·q_g] / (P·N) over
    * score-tie groups g.
    *
    * Scale design — the rank is NEVER a global window (the
    * one-partition sort trap): scores collapse to tie groups first
    * (keyed aggregation), each group lands in a VALUE bucket
    * ⌊score·B⌋ (ties can't straddle buckets), cross-bucket cumulative
    * negatives come from a B-row broadcast, and the within-bucket
    * cumulative is a window PARTITIONED by bucket. All counts stay
    * exact integers (decimal-backed pair sums — P·N overflows a long
    * at ~10^10 docs) until one final divide, mirrored in [[O.auc]].
    */
  val AucBuckets = 1024

  def auc(scored: DataFrame, buckets: Int = AucBuckets): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = scored.groupBy("score").agg(
      sum(col("label").cast("long")).as("p"),
      sum(lit(1L) - col("label").cast("long")).as("q"))
      .withColumn("bucket", floor(col("score") * buckets).cast("long"))
    val wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    val bucketBelow = g.groupBy("bucket").agg(sum(col("q")).as("bq"))
      // B rows total: the unpartitioned window is a deliberate
      // constant-size single partition, not a data-scale sort
      .withColumn("qb_bucket", coalesce(sum(col("bq")).over(wb), lit(0L)))
      .select("bucket", "qb_bucket")
    val ww = Window.partitionBy("bucket").orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    val rows = g.join(broadcast(bucketBelow), "bucket")
      .withColumn("qb", col("qb_bucket") + coalesce(sum(col("q")).over(ww), lit(0L)))
    rows.agg(
      sum(col("p")).as("n_pos"),
      sum(col("q")).as("n_neg"),
      count(lit(1)).as("n_score_groups"),
      sum((col("p") * col("qb")).cast("decimal(38,0)")).as("uw"),
      sum((col("p") * col("q")).cast("decimal(38,0)")).as("ties"))
      .select(
        col("n_pos"), col("n_neg"), col("n_score_groups"),
        round((col("uw") * 2 + col("ties")).cast("double") /
          (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")), 6)
          .as("auc"))
  }

  /** [[auc]] per key group (the model-quality breakdown: does the
    * classifier separate equally well across languages / time slices /
    * strata?). Same bucketed two-level cumulative, every window now
    * additionally partitioned by the key; degenerate groups (a single
    * class) carry no pair statistic and are dropped — mirrored by the
    * oracle's HAVING.
    */
  def aucBy(scored: DataFrame, keyCol: String, buckets: Int = AucBuckets): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = scored.groupBy(col(keyCol), col("score")).agg(
      sum(col("label").cast("long")).as("p"),
      sum(lit(1L) - col("label").cast("long")).as("q"))
      .withColumn("bucket", floor(col("score") * buckets).cast("long"))
    val wb = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketBelow = g.groupBy(col(keyCol), col("bucket")).agg(sum(col("q")).as("bq"))
      .withColumn("qb_bucket", coalesce(sum(col("bq")).over(wb), lit(0L)))
      .select(col(keyCol), col("bucket"), col("qb_bucket"))
    val ww = Window.partitionBy(col(keyCol), col("bucket")).orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    val rows = g.join(broadcast(bucketBelow), Seq(keyCol, "bucket"))
      .withColumn("qb", col("qb_bucket") + coalesce(sum(col("q")).over(ww), lit(0L)))
    rows.groupBy(keyCol).agg(
      sum(col("p")).as("n_pos"),
      sum(col("q")).as("n_neg"),
      count(lit(1)).as("n_score_groups"),
      sum((col("p") * col("qb")).cast("decimal(38,0)")).as("uw"),
      sum((col("p") * col("q")).cast("decimal(38,0)")).as("ties"))
      .filter(col("n_pos") > 0 && col("n_neg") > 0)
      .select(
        col(keyCol), col("n_pos"), col("n_neg"), col("n_score_groups"),
        round((col("uw") * 2 + col("ties")).cast("double") /
          (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")), 6)
          .as("auc"))
  }

  /** Collects the trained 4-weight model for literal re-use (e.g. by a
    * streaming scorer): (bias, w1, w2, w3). Unlike the scoring entry
    * points, nothing downstream reads the feature frame once fit
    * returns, so the training cache is dropped here rather than pinned.
    * (trainDomainClassifier/scoreDocuments keep theirs: the returned
    * lazy frame still reads it, so lifecycle belongs to the caller —
    * the shared-subtree convention; Verify clears per query.)
    */
  /** Exact per-document SHAP attributions for the linear model (the
    * closed form: for z = b + Σ wᵢxᵢ with independent-baseline
    * expectation, φᵢ = wᵢ·(xᵢ − E[xᵢ]) and z = base + Σφᵢ exactly) —
    * the explainability read a production filter ships next to its
    * verdicts: WHY did this doc score low (length? token shape?
    * stopword mass?). One trajectory + one 3-mean aggregate + a
    * narrow per-doc projection; `top_feature` breaks |φ| ties in
    * feature order, on the rounded values in both engines.
    */
  def shapAttributions(docs: DataFrame, labelPred: Column,
      lr: Double = Lr, iters: Int = Iters): DataFrame = {
    val f = features(docs, labelPred).cache()
    val w = fit(f, lr, iters)
    val means = f.agg(Num.davg(col("x1")).as("m1"), Num.davg(col("x2")).as("m2"),
      Num.davg(col("x3")).as("m3"))
    f.crossJoin(broadcast(means))
      .withColumn("phi1", round(lit(w(1)) * (col("x1") - col("m1")), 6))
      .withColumn("phi2", round(lit(w(2)) * (col("x2") - col("m2")), 6))
      .withColumn("phi3", round(lit(w(3)) * (col("x3") - col("m3")), 6))
      .select(col("doc_id"), col("phi1"), col("phi2"), col("phi3"),
        round(lit(w(0)) + lit(w(1)) * col("m1") + lit(w(2)) * col("m2")
          + lit(w(3)) * col("m3"), 6).as("base_z"),
        when(abs(col("phi1")) >= abs(col("phi2"))
            && abs(col("phi1")) >= abs(col("phi3")), "x1")
          .when(abs(col("phi2")) >= abs(col("phi3")), "x2")
          .otherwise("x3").as("top_feature"))
      .orderBy("doc_id")
  }

  /** Calibration curve / ECE decomposition: scored docs bucketed into
    * `bins` fixed-width confidence bins, each reporting mean confidence
    * vs empirical positive rate and its Expected-Calibration-Error
    * contribution (n_b/N)·|conf − acc| — the "is 0.9 really 90%?" read
    * that decides whether the filter's scores can be thresholded or
    * must be re-calibrated (q219's conformal gate is the fix; this is
    * the detector). Bins are equal-width over the OBSERVED score range
    * (the algebraic sigmoid compresses |z| ≪ 1 scores into a narrow
    * band, so absolute [0,1] deciles would be degenerate) — min/max of
    * already-rounded scores are engine-exact, so the layout is too;
    * per-bin means are decimal-backed and rounded before the gap.
    */
  def calibrationCurve(docs: DataFrame, labelPred: Column,
      lr: Double = Lr, iters: Int = Iters, bins: Int = 10): DataFrame = {
    val f = features(docs, labelPred).cache()
    val w = fit(f, lr, iters)
    val scored = f.select(col("y"), round(sigmoid(z(w)), 6).as("score"))
    val tot = scored.agg(count(lit(1)).as("n_all"))
    scored
      .crossJoin(broadcast(scored.agg(min(col("score")).as("mn"), max(col("score")).as("mx"))))
      .withColumn("bin", rangeBin(bins))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        round(Num.davg(col("score")), 6).as("avg_conf"),
        round(Num.davg(col("y")), 6).as("frac_pos"))
      .crossJoin(broadcast(tot))
      .withColumn("ece_contrib",
        round(col("n_docs").cast("double") / col("n_all")
          * abs(col("avg_conf") - col("frac_pos")), 6))
      .select("bin", "n_docs", "avg_conf", "frac_pos", "ece_contrib")
      .orderBy("bin")
  }

  /** Population Stability Index of the score distribution between a
    * reference cohort and the current one (`refPred` splits; the
    * industry-standard drift alarm beside q151's JSD): fixed-width
    * score bins, add-0.5 smoothing over the bin count so empty bins
    * stay finite, PSI = Σ (p_cur − p_ref)·ln(p_cur/p_ref) reported as
    * per-bin contributions (the drilldown IS the diagnosis: which
    * score region moved). One scoring pass + one keyed count.
    */
  /** Equal-width bin over the observed [mn, mx] score range (bin 0
    * when the range is degenerate) — shared by the calibration and PSI
    * layouts; rounded-score min/max keep it engine-exact.
    */
  private def rangeBin(bins: Int): Column =
    when(col("mx") > col("mn"),
      least(floor((col("score") - col("mn")) / (col("mx") - col("mn")) * bins),
        lit((bins - 1).toLong)))
      .otherwise(lit(0L)).cast("int")

  def psiDrift(docs: DataFrame, labelPred: Column, refPred: Column,
      lr: Double = Lr, iters: Int = Iters, bins: Int = 10): DataFrame = {
    val f = features(docs, labelPred).cache()
    val w = fit(f, lr, iters)
    val scored0 = f.select(col("doc_id"), round(sigmoid(z(w)), 6).as("score"))
      .withColumn("is_ref", refPred)
    val scored = scored0
      .crossJoin(broadcast(scored0.agg(min(col("score")).as("mn"), max(col("score")).as("mx"))))
      .withColumn("bin", rangeBin(bins))
    val cnts = scored.groupBy("bin").agg(
      sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
      sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur"))
    val tots = cnts.agg(sum(col("n_ref")).as("t_ref"), sum(col("n_cur")).as("t_cur"))
    cnts.crossJoin(broadcast(tots))
      .withColumn("p_ref", (col("n_ref").cast("double") + 0.5)
        / (col("t_ref").cast("double") + lit(0.5) * bins))
      .withColumn("p_cur", (col("n_cur").cast("double") + 0.5)
        / (col("t_cur").cast("double") + lit(0.5) * bins))
      .withColumn("psi_contrib",
        round((col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")), 6))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round(col("p_ref"), 6).as("p_ref"), round(col("p_cur"), 6).as("p_cur"),
        col("psi_contrib"))
      .orderBy("bin")
  }

  def trainedWeights(docs: DataFrame, labelPred: Column,
      lr: Double = Lr, iters: Int = Iters, trainPct: Int = 100): Array[Double] = {
    val f = features(docs, labelPred).cache()
    try fit(trainSet(f, trainPct), lr, iters)
    finally f.unpersist()
  }

  /** DuckDB oracle: replays the full GD trajectory as `iters` unrolled
    * CTE stages (1-row weight relations cross-joined into each
    * aggregation), then scores the final boundary — every expression
    * the bit-identical twin of the Spark side.
    */
  object O {
    private def zSql = "(w.b + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3)"

    /** One GD trajectory as CTE text: train$p + w${p}0 + `iters`
      * unrolled stages ending in relation `w$p$iters`; `p` prefixes
      * every fold-local name so several trajectories (cross-validation)
      * can share one WITH clause over the same `feats`.
      */
    private[Classifier] def trajectoryStages(lr: Double, iters: Int,
        trainWhere: String, p: String = ""): String = {
      val err = s"((0.5 + 0.5 * $zSql / (1.0 + abs($zSql))) - f.y)"
      val iterCtes = (1 to iters).map { t =>
        s"""g$p$t AS (SELECT w.b, w.w1, w.w2, w.w3, CAST(COUNT(*) AS DOUBLE) AS n,
           |  ${Num.O.sumHi(err)} AS g0,
           |  ${Num.O.sumHi(s"$err * f.x1")} AS g1,
           |  ${Num.O.sumHi(s"$err * f.x2")} AS g2,
           |  ${Num.O.sumHi(s"$err * f.x3")} AS g3
           |  FROM train$p f CROSS JOIN w$p${t - 1} w GROUP BY 1, 2, 3, 4),
           |w$p$t AS (SELECT round(b - $lr * (g0 / n), 12) AS b,
           |  round(w1 - $lr * (g1 / n), 12) AS w1,
           |  round(w2 - $lr * (g2 / n), 12) AS w2,
           |  round(w3 - $lr * (g3 / n), 12) AS w3 FROM g$p$t)""".stripMargin
      }.mkString(",\n")
      s"""train$p AS (SELECT * FROM feats$trainWhere),
         |w${p}0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
         |$iterCtes""".stripMargin
    }

    private[Classifier] def featsCte(labelSql: String): String =
      s"""s AS (SELECT doc_id, source, ${TextAnalysis.O.textStats} FROM documents),
         |feats AS (SELECT doc_id,
         |  least(n_tokens / 200.0, 1.0) AS x1,
         |  least(avg_token_len / 8.0, 1.0) AS x2,
         |  least(stopword_ratio * 2.0, 1.0) AS x3,
         |  CASE WHEN $labelSql THEN 1.0 ELSE 0.0 END AS y FROM s)""".stripMargin

    /** The shared trajectory prefix: feature CTE + w0 + `iters`
      * unrolled GD stages ending in relation `w$iters`.
      */
    private def trajectoryCtes(labelSql: String, lr: Double, iters: Int,
        trainPct: Int = 100): String = {
      val trainWhere =
        if (trainPct >= 100) ""
        else s" WHERE ${Sampling.O.hashBucket("doc_id")} < $trainPct"
      s"""WITH ${featsCte(labelSql)},
         |${trajectoryStages(lr, iters, trainWhere)}""".stripMargin
    }

    def trainDomainClassifier(labelSql: String,
        lr: Double = Lr, iters: Int = Iters, trainPct: Int = 100): String = {
      s"""${trajectoryCtes(labelSql, lr, iters, trainPct)},
         |m AS (SELECT COUNT(*) AS n_docs,
         |  CAST(SUM(CAST(f.y AS BIGINT)) AS BIGINT) AS n_pos,
         |  CAST(SUM(CASE WHEN $zSql >= 0.0 AND f.y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |  CAST(SUM(CASE WHEN $zSql >= 0.0 AND NOT (f.y = 1.0) THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |  CAST(SUM(CASE WHEN NOT ($zSql >= 0.0) AND NOT (f.y = 1.0) THEN 1 ELSE 0 END) AS BIGINT) AS tn,
         |  CAST(SUM(CASE WHEN NOT ($zSql >= 0.0) AND f.y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |  ANY_VALUE(w.b) AS w_bias, ANY_VALUE(w.w1) AS w1, ANY_VALUE(w.w2) AS w2, ANY_VALUE(w.w3) AS w3
         |  FROM feats f CROSS JOIN w$iters w)
         |SELECT CAST($iters AS INT) AS iters, w_bias, w1, w2, w3, n_docs, n_pos,
         |  tp, fp, tn, fn,
         |  round(CAST(tp + tn AS DOUBLE) / n_docs, 6) AS accuracy
         |FROM m""".stripMargin
    }

    /** Mirrors scoreDocuments: identical trajectory, per-doc σ̂ score.
      * Accepts trainPct so a hash-sampled training run stays
      * oracle-checkable (API symmetry with the Spark side).
      */
    def scoreDocuments(labelSql: String,
        lr: Double = Lr, iters: Int = Iters, trainPct: Int = 100): String =
      s"""${trajectoryCtes(labelSql, lr, iters, trainPct)}
         |SELECT doc_id, CAST(f.y AS INT) AS label,
         |  round((0.5 + 0.5 * $zSql / (1.0 + abs($zSql))), 6) AS score,
         |  ($zSql >= 0.0) AS predicted_positive
         |FROM feats f CROSS JOIN w$iters w ORDER BY doc_id""".stripMargin

    /** Mirrors [[Classifier.shapAttributions]]: the trajectory's final
      * weights, decimal feature means, the closed-form φ columns, the
      * same rounded |φ| tie order.
      */
    def shapAttributions(labelSql: String,
        lr: Double = Lr, iters: Int = Iters): String =
      s"""${trajectoryCtes(labelSql, lr, iters)},
         |m AS (SELECT ${Num.O.avg("x1")} AS m1, ${Num.O.avg("x2")} AS m2,
         |        ${Num.O.avg("x3")} AS m3 FROM feats),
         |ph AS (SELECT f.doc_id,
         |    round(w.w1 * (f.x1 - m.m1), 6) AS phi1,
         |    round(w.w2 * (f.x2 - m.m2), 6) AS phi2,
         |    round(w.w3 * (f.x3 - m.m3), 6) AS phi3,
         |    round(w.b + w.w1 * m.m1 + w.w2 * m.m2 + w.w3 * m.m3, 6) AS base_z
         |  FROM feats f CROSS JOIN w$iters w CROSS JOIN m)
         |SELECT doc_id, phi1, phi2, phi3, base_z,
         |  CASE WHEN abs(phi1) >= abs(phi2) AND abs(phi1) >= abs(phi3) THEN 'x1'
         |       WHEN abs(phi2) >= abs(phi3) THEN 'x2' ELSE 'x3' END AS top_feature
         |FROM ph ORDER BY doc_id""".stripMargin

    /** The range-scaled bin expression shared by the calibration and
      * PSI oracles (requires `sc(score)` and `rg(mn, mx)` CTEs).
      */
    private def rangeBinSql(bins: Int): String =
      s"""CAST(CASE WHEN mx > mn
         |  THEN least(floor((score - mn) / (mx - mn) * $bins), ${bins - 1})
         |  ELSE 0 END AS INT)""".stripMargin.replace("\n", " ")

    /** Mirrors [[Classifier.calibrationCurve]]: range-scaled bins,
      * decimal per-bin means rounded before the gap.
      */
    def calibrationCurve(labelSql: String, lr: Double = Lr,
        iters: Int = Iters, bins: Int = 10): String =
      s"""${trajectoryCtes(labelSql, lr, iters)},
         |sc AS (SELECT f.y,
         |    round((0.5 + 0.5 * $zSql / (1.0 + abs($zSql))), 6) AS score
         |  FROM feats f CROSS JOIN w$iters w),
         |rg AS (SELECT min(score) AS mn, max(score) AS mx FROM sc),
         |tot AS (SELECT COUNT(*) AS n_all FROM sc),
         |g AS (SELECT ${rangeBinSql(bins)} AS bin,
         |        COUNT(*) AS n_docs,
         |        round(${Num.O.avg("score")}, 6) AS avg_conf,
         |        round(${Num.O.avg("y")}, 6) AS frac_pos
         |      FROM sc CROSS JOIN rg GROUP BY 1)
         |SELECT bin, n_docs, avg_conf, frac_pos,
         |  round(CAST(n_docs AS DOUBLE) / n_all * abs(avg_conf - frac_pos), 6) AS ece_contrib
         |FROM g CROSS JOIN tot ORDER BY bin""".stripMargin

    /** Mirrors [[Classifier.psiDrift]]: the same fixed bins, add-0.5
      * smoothing over the bin count, per-bin PSI contributions from
      * unrounded masses.
      */
    def psiDrift(labelSql: String, refSql: String, lr: Double = Lr,
        iters: Int = Iters, bins: Int = 10): String =
      s"""${trajectoryCtes(labelSql, lr, iters)},
         |sc AS (SELECT f.doc_id, ($refSql) AS is_ref,
         |    round((0.5 + 0.5 * $zSql / (1.0 + abs($zSql))), 6) AS score
         |  FROM feats f CROSS JOIN w$iters w),
         |rg AS (SELECT min(score) AS mn, max(score) AS mx FROM sc),
         |c AS (SELECT ${rangeBinSql(bins)} AS bin,
         |        CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
         |        CAST(SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
         |      FROM sc CROSS JOIN rg GROUP BY 1),
         |t AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref,
         |        CAST(SUM(n_cur) AS BIGINT) AS t_cur FROM c),
         |p AS (SELECT bin, n_ref, n_cur,
         |        (CAST(n_ref AS DOUBLE) + 0.5) / (CAST(t_ref AS DOUBLE) + 0.5 * $bins) AS p_ref,
         |        (CAST(n_cur AS DOUBLE) + 0.5) / (CAST(t_cur AS DOUBLE) + 0.5 * $bins) AS p_cur
         |      FROM c CROSS JOIN t)
         |SELECT bin, n_ref, n_cur, round(p_ref, 6) AS p_ref, round(p_cur, 6) AS p_cur,
         |  round((p_cur - p_ref) * ln(p_cur / p_ref), 6) AS psi_contrib
         |FROM p ORDER BY bin""".stripMargin

    /** Mirrors [[Classifier.crossValidate]]: k fold-prefixed
      * trajectories sharing one feats CTE, per-fold eval confusion.
      */
    def crossValidate(labelSql: String, folds: Int = 5,
        lr: Double = Lr, iters: Int = Iters): String = {
      val span = 100 / folds
      val bkt = Sampling.O.hashBucket("doc_id")
      val stages = (0 until folds).map { k =>
        val where =
          s" WHERE NOT ($bkt >= ${k * span} AND $bkt < ${(k + 1) * span})"
        trajectoryStages(lr, iters, where, p = s"f${k}_")
      }
      val rows = (0 until folds).map { k =>
        val p = s"f${k}_"
        s"""SELECT fold, n_eval, tp, fp, tn, fn,
           |  round(CAST(tp + tn AS DOUBLE) / n_eval, 6) AS accuracy
           |FROM (SELECT $k AS fold, COUNT(*) AS n_eval,
           |  CAST(SUM(CASE WHEN $zSql >= 0.0 AND f.y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           |  CAST(SUM(CASE WHEN $zSql >= 0.0 AND NOT (f.y = 1.0) THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           |  CAST(SUM(CASE WHEN NOT ($zSql >= 0.0) AND NOT (f.y = 1.0) THEN 1 ELSE 0 END) AS BIGINT) AS tn,
           |  CAST(SUM(CASE WHEN NOT ($zSql >= 0.0) AND f.y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS fn
           |  FROM (SELECT * FROM feats
           |        WHERE $bkt >= ${k * span} AND $bkt < ${(k + 1) * span}) f
           |  CROSS JOIN w$p$iters w)""".stripMargin
      }
      s"""WITH ${featsCte(labelSql)},
         |${stages.mkString(",\n")}
         |${rows.mkString("\nUNION ALL\n")}
         |ORDER BY fold""".stripMargin
    }

    /** Mirrors [[Classifier.learningCurve]]: one prefixed trajectory
      * per training fraction, one shared eval split.
      */
    def learningCurve(labelSql: String, trainPcts: Seq[Int] = Seq(10, 20, 40, 80),
        lr: Double = Lr, iters: Int = Iters): String = {
      val bkt = Sampling.O.hashBucket("doc_id")
      val stages = trainPcts.map { pct =>
        trajectoryStages(lr, iters, s" WHERE $bkt < $pct", p = s"p${pct}_")
      }
      val rows = trainPcts.map { pct =>
        val p = s"p${pct}_"
        s"""SELECT train_pct, n_eval, tp, fp, tn, fn,
           |  round(CAST(tp + tn AS DOUBLE) / n_eval, 6) AS accuracy
           |FROM (SELECT $pct AS train_pct, COUNT(*) AS n_eval,
           |  CAST(SUM(CASE WHEN $zSql >= 0.0 AND f.y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           |  CAST(SUM(CASE WHEN $zSql >= 0.0 AND NOT (f.y = 1.0) THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           |  CAST(SUM(CASE WHEN NOT ($zSql >= 0.0) AND NOT (f.y = 1.0) THEN 1 ELSE 0 END) AS BIGINT) AS tn,
           |  CAST(SUM(CASE WHEN NOT ($zSql >= 0.0) AND f.y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS fn
           |  FROM (SELECT * FROM feats WHERE $bkt >= 80) f
           |  CROSS JOIN w$p$iters w)""".stripMargin
      }
      s"""WITH ${featsCte(labelSql)},
         |${stages.mkString(",\n")}
         |${rows.mkString("\nUNION ALL\n")}
         |ORDER BY train_pct""".stripMargin
    }

    /** Mirrors [[Classifier.conformalGate]]: identical trajectory +
      * scoring (trainPct 60), same bucket split, same order-statistic
      * threshold and eval counters.
      */
    def conformalGate(labelSql: String, eps: Double = 0.1,
        lr: Double = Lr, iters: Int = Iters): String =
      s"""WITH sc AS MATERIALIZED (
         |  SELECT doc_id, label, score
         |  FROM (${scoreDocuments(labelSql, lr, iters, trainPct = 60)})),
         |sb AS MATERIALIZED (SELECT doc_id, label, score,
         |        ${Sampling.O.hashBucket("doc_id")} AS b FROM sc),
         |cal AS (SELECT score FROM sb WHERE b >= 60 AND b < 80 AND label = 0),
         |nc AS (SELECT COUNT(*) AS n_cal_neg FROM cal),
         |cum AS (SELECT score, SUM(COUNT(*)) OVER (ORDER BY score
         |          ROWS UNBOUNDED PRECEDING) AS cum FROM cal GROUP BY score),
         |thr AS (SELECT MIN(score) AS threshold FROM cum CROSS JOIN nc
         |        WHERE cum >= ceil(${1.0 - eps} * CAST(n_cal_neg + 1 AS DOUBLE))),
         |ev AS (SELECT label, score FROM sb WHERE b >= 80),
         |m AS (SELECT
         |  CAST(SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_eval_pos,
         |  CAST(SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_eval_neg,
         |  CAST(SUM(CASE WHEN label = 1 AND score > threshold THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |  CAST(SUM(CASE WHEN label = 0 AND score > threshold THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |  ANY_VALUE(threshold) AS threshold
         |  FROM ev CROSS JOIN thr)
         |SELECT CAST($eps AS DOUBLE) AS epsilon, nc.n_cal_neg, m.threshold,
         |  m.n_eval_pos, m.n_eval_neg, m.tp, m.fp,
         |  round(CAST(tp AS DOUBLE) / CAST(n_eval_pos AS DOUBLE), 6) AS recall,
         |  round(CAST(fp AS DOUBLE) / CAST(n_eval_neg AS DOUBLE), 6) AS empirical_fpr
         |FROM m CROSS JOIN nc""".stripMargin

    /** Mirrors [[Classifier.auc]]: identical trajectory + scoring, then
      * the Mann–Whitney statistic over score-tie groups. The oracle may
      * use the plain global cumulative (its data fits one node); the
      * Spark side's bucketed two-level cumulative computes the same
      * exact integers, so the final rounded divide matches.
      */
    def auc(labelSql: String,
        lr: Double = Lr, iters: Int = Iters, trainPct: Int = 100): String =
      s"""WITH sc AS (SELECT * FROM (${scoreDocuments(labelSql, lr, iters, trainPct)})),
         |g AS (SELECT score,
         |        CAST(SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS p,
         |        CAST(SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS q
         |      FROM sc GROUP BY 1),
         |c AS (SELECT p, q,
         |        COALESCE(SUM(q) OVER (ORDER BY score
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS qb
         |      FROM g),
         |a AS (SELECT CAST(SUM(p) AS BIGINT) AS n_pos, CAST(SUM(q) AS BIGINT) AS n_neg,
         |        COUNT(*) AS n_score_groups,
         |        SUM(p * qb) AS uw, SUM(p * q) AS ties FROM c)
         |SELECT n_pos, n_neg, n_score_groups,
         |  round(CAST(uw * 2 + ties AS DOUBLE) /
         |    (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 6) AS auc
         |FROM a""".stripMargin

    /** Mirrors [[Classifier.aucBy]] with the key fetched from the
      * documents row (`keyCol`); degenerate single-class groups drop
      * via HAVING, matching the Spark-side filter.
      */
    def aucBy(labelSql: String, keyCol: String,
        lr: Double = Lr, iters: Int = Iters, trainPct: Int = 100): String =
      s"""WITH sc0 AS (SELECT * FROM (${scoreDocuments(labelSql, lr, iters, trainPct)})),
         |sc AS (SELECT d.$keyCol AS k, sc0.label, sc0.score
         |       FROM sc0 JOIN documents d USING (doc_id)),
         |g AS (SELECT k, score,
         |        CAST(SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS p,
         |        CAST(SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS q
         |      FROM sc GROUP BY 1, 2),
         |c AS (SELECT k, p, q,
         |        COALESCE(SUM(q) OVER (PARTITION BY k ORDER BY score
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS qb
         |      FROM g),
         |a AS (SELECT k, CAST(SUM(p) AS BIGINT) AS n_pos, CAST(SUM(q) AS BIGINT) AS n_neg,
         |        COUNT(*) AS n_score_groups,
         |        SUM(p * qb) AS uw, SUM(p * q) AS ties
         |      FROM c GROUP BY 1 HAVING SUM(p) > 0 AND SUM(q) > 0)
         |SELECT k AS $keyCol, n_pos, n_neg, n_score_groups,
         |  round(CAST(uw * 2 + ties AS DOUBLE) /
         |    (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 6) AS auc
         |FROM a ORDER BY $keyCol""".stripMargin
  }
}
