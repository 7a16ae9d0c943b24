package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Num

/** Robust statistics for quality gating: winsorized means (clip at
  * group percentiles before averaging) and MAD-based outlier detection
  * (median absolute deviation — the robust twin of the z-score operator
  * W5, immune to the outliers it hunts).
  *
  * Scale design: each statistic is a keyed aggregation producing a
  * tiny per-group bound table that broadcast-joins back to the stream —
  * the corpus shuffles once per percentile pass and never sorts
  * globally. Percentile interpolation is the one engine-divergent step,
  * so bounds are rounded at 6 dp BEFORE use; all downstream clip /
  * compare / decimal-mean arithmetic is then bit-identical.
  */
object Robust {

  /** Per-key Theil–Sen slope (Theil 1950 / Sen 1968): the exact median
    * of pairwise slopes over each key's most recent `k` points — the
    * robust trend estimate outliers cannot drag (breakdown point ~29%,
    * where the q106 OLS line breaks at one bad reading).
    *
    * Scale design — bounded by contract: the recency window keeps k
    * points per key, so the pair space is C(k,2) per key at ANY history
    * length, and every shuffle (recency ranking, pair join, median
    * ranking) is keyed by the entity. The median is the LOWER exact
    * order statistic, selected deterministically (slope, then the pair
    * indices as tie-break). Slopes never exist as raw double quotients:
    * each value becomes exact integer MICRO-UNITS (a 6-dp decimal cast,
    * far from any representation boundary for fixed-point-ish inputs),
    * and the slope is the pure integer division Δvu div Δt — truncation
    * toward zero, which Spark's `div` and DuckDB's `//` both implement —
    * so ranking and the emitted value are bit-identical across engines
    * (the q106/q212 decimal discipline; a round(double, 6) here sat on
    * representation/half boundaries where BigDecimal HALF_UP and a
    * given DuckDB build can disagree). Same-timestamp pairs carry no
    * slope and are excluded (the standard Theil–Sen tie rule).
    */
  def theilSenSlope(df: DataFrame, keyCol: String, timeCol: String,
      valueCol: String, idCol: String, k: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wDesc = Window.partitionBy(keyCol).orderBy(col(timeCol).desc, col(idCol).desc)
    val recent = df
      .select(col(keyCol), col(timeCol), col(valueCol), col(idCol))
      .withColumn("rn", row_number().over(wDesc))
      .filter(col("rn") <= k)
      .select(col(keyCol), col("rn"),
        unix_timestamp(col(timeCol)).as("tsec"),
        (col(valueCol).cast(org.apache.spark.sql.types.DecimalType(20, 6)) * lit(1000000))
          .cast("long").as("vu"))
    val a = recent.select(col(keyCol), col("rn").as("rna"), col("tsec").as("ta"), col("vu").as("vau"))
    val b = recent.select(col(keyCol), col("rn").as("rnb"), col("tsec").as("tb"), col("vu").as("vbu"))
    val pairs = a.join(b, Seq(keyCol))
      .filter(col("rna") < col("rnb") && col("ta") =!= col("tb"))
      .withColumn("slope_u", expr("(vau - vbu) div (ta - tb)"))
    val wMed = Window.partitionBy(keyCol).orderBy(col("slope_u"), col("rna"), col("rnb"))
    val nPoints = recent.groupBy(keyCol).agg(max(col("rn")).as("n_points"))
    pairs
      .withColumn("mrn", row_number().over(wMed))
      .withColumn("npairs", count(lit(1)).over(Window.partitionBy(keyCol)))
      .filter(col("mrn") === expr("(npairs + 1) div 2"))
      .join(broadcast(nPoints), keyCol)
      .select(col(keyCol), col("n_points"), col("npairs").as("n_pairs"),
        (col("slope_u").cast("double") / lit(1000000.0)).as("ts_slope"))
  }

  /** Per-group winsorized mean: clip values into the group's
    * [pLo, pHi] percentile band, then decimal-exact average.
    */
  def winsorizedAvg(df: DataFrame, groupCol: String, valueCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    val bounds = df.groupBy(groupCol).agg(
      round(percentile(col(valueCol), lit(pLo)), 6).as("lo"),
      round(percentile(col(valueCol), lit(pHi)), 6).as("hi"))
    df.join(broadcast(bounds), groupCol)
      .withColumn("clipped", least(greatest(col(valueCol), col("lo")), col("hi")))
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n"),
        first(col("lo")).as("lo"),
        first(col("hi")).as("hi"),
        Num.davg(col(valueCol)).as("raw_avg"),
        Num.davg(col("clipped")).as("winsorized_avg"))
  }

  val HistLo = 0.0
  val HistHi = 600.0
  val HistBins = 240 // width 2.5 — exactly representable in binary

  /** Bounded-memory quantile ESTIMATES from a fixed equi-width histogram
    * — the mergeable sketch that replaces exact `percentile` where
    * per-group value buffering cannot run (exact percentile holds every
    * value of a group in memory; this holds `HistBins` counters no
    * matter how many rows). Counters are plain counts, so partial
    * aggregation, merging across partitions, and streaming micro-batch
    * merges are all exact; the estimate interpolates the target rank
    * inside its bin with a fixed expression shape (integer counts, one
    * double divide) that a DuckDB oracle reproduces bit-for-bit —
    * deterministic in a way t-digest/KLL can never be.
    *
    * Accuracy contract: the estimate lies in the bin containing the
    * value at target rank ceil(p·n), so it is within one bin width
    * (2.5 here) of that ORDER STATISTIC; vs percentile_cont's
    * interpolated value the error additionally carries the local
    * inter-rank gap (negligible on dense groups, unbounded on sparse
    * tails). The q122 calibration query prices the estimates against
    * exact percentiles on the real data.
    *
    * DOMAIN ASSUMPTION: values outside [HistLo, HistHi) are CLAMPED
    * into the edge bins, and a clamped value silently voids the
    * one-bin-width bound for any quantile landing in an edge bin (the
    * events.value domain here is [0, 600), so the default range is
    * lossless). Before trusting the bound on a new column, run
    * [[outOfRangeCounts]] — a nonzero row means the range constants
    * must be widened for that data.
    */
  /** The sketch-building half of histQuantile: per-group fixed-bin
    * counters as a plain keyed aggregation — STREAMING-COMPATIBLE
    * (update/complete-mode groupBy, no window functions), so the same
    * quantile sketch accumulates across micro-batches; feed the result
    * to [[estimateFromBins]] batch-side.
    */
  def histBinCounts(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val width = (HistHi - HistLo) / HistBins
    val bin = least(lit(HistBins - 1), greatest(lit(0),
      floor((col(valueCol) - HistLo) / width).cast("int")))
    // NULLs carry no rank information — drop them like exact percentile
    // does (Spark's greatest/least skip nulls, so an unfiltered NULL
    // would silently count as bin 0 and skew every estimate)
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), bin.as("bin"))
      .groupBy(col(groupCol), col("bin")).agg(count(lit(1)).as("c"))
  }

  def histQuantile(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double] = Seq(0.5, 0.95)): DataFrame =
    estimateFromBins(histBinCounts(df, groupCol, valueCol), groupCol, ps)

  /** Per-group count of values the fixed histogram range would clamp —
    * the calibration check for the domain assumption above (run once
    * when pointing the sketch at a new column; zero rows = the
    * one-bin-width accuracy contract holds everywhere).
    */
  def outOfRangeCounts(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .filter(col(valueCol) < HistLo || col(valueCol) >= HistHi)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("n_out_of_range"))

  /** Quantile estimates from a (group, bin, c) counter table (see
    * histBinCounts — possibly accumulated across a stream's lifetime).
    */
  def estimateFromBins(binned: DataFrame, groupCol: String,
      ps: Seq[Double] = Seq(0.5, 0.95)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val width = (HistHi - HistLo) / HistBins
    def pName(p: Double) = s"p${math.round(p * 100)}"
    val wCum = Window.partitionBy(groupCol).orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cums = binned
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(groupCol)))
    // per target p: the FIRST bin whose cumulative count reaches the
    // target rank, captured as a struct min (bin leads, so the struct
    // order is the bin order)
    val sels = ps.map { p =>
      val t = ceil(lit(p) * col("n").cast("double"))
      min(when(col("cum") >= t,
        struct(col("bin"), col("cum"), col("c"), t.as("t")))).as(s"sel_${pName(p)}")
    }
    val g = cums.groupBy(groupCol)
      .agg(max(col("n")).as("n"), sels: _*)
    ps.foldLeft(g) { (acc, p) =>
      val s = col(s"sel_${pName(p)}")
      acc.withColumn(s"est_${pName(p)}",
        round(
          lit(HistLo) + lit(width) * (s.getField("bin").cast("double") +
            (s.getField("t") - (s.getField("cum") - s.getField("c")).cast("double"))
              / s.getField("c").cast("double")),
          6))
    }.drop(ps.map(p => s"sel_${pName(p)}"): _*)
  }

  /** DuckDB twin of histQuantile for one percentile, as CTE text over
    * relation `m(g, bin, c, cum, n)`; kept beside the implementation so
    * the expression shapes cannot drift.
    */
  object O {
    /** Mirrors [[Robust.mannWhitney]]. `sourceCte` must define
      * `mwd(g, v)`; ranks replay the tie-average definition directly
      * (below + (cnt+1)/2), every double expression in the identical
      * op order.
      */
    def mannWhitney(sourceCte: String): String =
      s"""WITH $sourceCte,
         |gset AS (SELECT DISTINCT g FROM mwd),
         |prs AS (SELECT x.g AS ga, y.g AS gb FROM gset x JOIN gset y ON x.g < y.g),
         |rws AS MATERIALIZED (SELECT ga || '|' || gb AS pair, ga, gb, m.g, m.v
         |       FROM mwd m JOIN prs ON m.g = prs.ga OR m.g = prs.gb),
         |gv AS MATERIALIZED (SELECT pair, v, COUNT(*) AS cnt FROM rws GROUP BY 1, 2),
         |rr AS (SELECT pair, v,
         |         CAST(COALESCE(SUM(cnt) OVER (PARTITION BY pair ORDER BY v
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
         |           + (cnt + 1) / 2.0 AS r
         |       FROM gv),
         |ag AS (SELECT r2.pair, r2.ga, r2.gb, COUNT(*) AS n,
         |         CAST(SUM(CASE WHEN r2.g = r2.ga THEN 1 ELSE 0 END) AS BIGINT) AS na,
         |         ${Num.O.sum("CASE WHEN r2.g = r2.ga THEN rr.r ELSE 0.0 END")} AS ra
         |       FROM rws r2 JOIN rr ON rr.pair = r2.pair AND rr.v = r2.v
         |       GROUP BY 1, 2, 3),
         |tc AS (SELECT pair, SUM(cnt * cnt * cnt - cnt) AS tcorr FROM gv GROUP BY 1),
         |fin AS (SELECT ga, gb, na, n - na AS nb, tcorr, n,
         |          ra - CAST(na AS DOUBLE) * CAST(na + 1 AS DOUBLE) / 2.0 AS u
         |        FROM ag JOIN tc USING (pair))
         |SELECT source_a, source_b, na, nb, round(u, 6) AS u,
         |  round(CASE WHEN varu > 0
         |    THEN (u - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0) / sqrt(varu) END, 6) AS z,
         |  round(2.0 * u / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) - 1.0, 6) AS cliffs_delta
         |FROM (SELECT ga AS source_a, gb AS source_b, na, nb, u,
         |        CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0 *
         |          (CAST(n + 1 AS DOUBLE) - CAST(tcorr AS DOUBLE)
         |            / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) AS varu
         |      FROM fin)
         |ORDER BY source_a, source_b""".stripMargin

    def histCte(table: String, groupCol: String, valueCol: String): String = {
      val width = (HistHi - HistLo) / HistBins
      s"""SELECT $groupCol AS g, bin, COUNT(*) AS c,
         |  SUM(COUNT(*)) OVER (PARTITION BY $groupCol ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
         |  SUM(COUNT(*)) OVER (PARTITION BY $groupCol) AS n
         |FROM (SELECT $groupCol,
         |        least(${HistBins - 1}, greatest(0, CAST(floor(($valueCol - $HistLo) / $width) AS INT))) AS bin
         |      FROM $table WHERE $valueCol IS NOT NULL)
         |GROUP BY $groupCol, bin""".stripMargin
    }

    def estSelect(p: Double): String = {
      val width = (HistHi - HistLo) / HistBins
      s"""SELECT g, round($HistLo + $width * (CAST(bin AS DOUBLE) +
         |    (t - CAST(cum - c AS DOUBLE)) / CAST(c AS DOUBLE)), 6) AS est
         |FROM (SELECT g, bin, c, cum, ceil($p * CAST(n AS DOUBLE)) AS t,
         |        row_number() OVER (PARTITION BY g ORDER BY bin) AS rn
         |      FROM m WHERE cum >= ceil($p * CAST(n AS DOUBLE)))
         |WHERE rn = 1""".stripMargin
    }

    /** DuckDB twin of [[logBinCounts]]: (g, lbin, c) counter rows —
      * the same pure-integer bit math (bucket via length(bin(x)),
      * variable shifts), so parity is exact by construction.
      */
    def logBinsCte(table: String, groupCol: String, valueCol: String): String = {
      val m = LogSubBits
      val sc = LogSubCount
      s"""SELECT g, lbin, COUNT(*) AS c FROM (
         |  SELECT $groupCol AS g,
         |    CASE WHEN v < $sc THEN v
         |         ELSE ((length(bin(v)) - 1) - $m) * $sc + (v >> CAST((length(bin(v)) - 1) - $m AS INT))
         |    END AS lbin
         |  FROM (SELECT $groupCol, CAST($valueCol AS BIGINT) AS v FROM $table
         |        WHERE $valueCol IS NOT NULL AND $valueCol >= 1))
         |GROUP BY g, lbin""".stripMargin
    }

    /** Cumulative/total wrapper over a (g, lbin, c) counter relation —
      * also the MERGE replay: summed counter tables from any number of
      * sketches feed straight in.
      */
    def logCumCte(binsRel: String): String =
      s"""SELECT g, lbin, c,
         |  SUM(c) OVER (PARTITION BY g ORDER BY lbin ROWS UNBOUNDED PRECEDING) AS cum,
         |  SUM(c) OVER (PARTITION BY g) AS n
         |FROM $binsRel""".stripMargin

    /** DuckDB twin of [[logBinCounts]] + the cumulative, as CTE text
      * yielding lm(g, lbin, c, cum, n).
      */
    def logCte(table: String, groupCol: String, valueCol: String): String =
      logCumCte(s"(${logBinsCte(table, groupCol, valueCol)})")

    /** DuckDB twin of the [[logEstimateFromBins]] selection for one p,
      * over relation `rel` (default lm): (g, est) with est the integer
      * bucket midpoint.
      */
    def logEstSelect(p: Double, rel: String = "lm"): String = {
      val m = LogSubBits
      val sc = LogSubCount
      s"""SELECT g, CASE WHEN sel < ${2 * sc} THEN sel
         |  ELSE (((sel - ((sel >> $m) - 1) * $sc) << CAST((sel >> $m) - 1 AS INT))
         |      + (((sel - ((sel >> $m) - 1) * $sc) + 1) << CAST((sel >> $m) - 1 AS INT)) - 1) >> 1
         |END AS est
         |FROM (SELECT g, min(lbin) AS sel FROM $rel
         |      WHERE cum >= ceil($p * CAST(n AS DOUBLE)) GROUP BY g)""".stripMargin
    }
  }

  /** Tie-aware average ranks of `valueCol` within each `keyCol` group,
    * distributed (the q198 bucketed two-level cumulative, generalized
    * to arbitrary value ranges): tie groups collapse first (keyed
    * aggregation with map-side partials), each group lands in a
    * min/max-normalized VALUE bucket (equal values cannot straddle a
    * bucket), cross-bucket counts cumulate over the per-key B-row
    * bucket table, and the within-bucket cumulative is a
    * (key, bucket)-partitioned window — a group's rank statistics
    * never sort in one partition. Returns one row per (key, value):
    * (keyCol, v, cnt, r) with r the average rank (a half-integer,
    * exact in doubles).
    */
  private[operators] def tieRanks(df: DataFrame, keyCol: String, valueCol: String,
      buckets: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df.groupBy(col(keyCol), col(valueCol).as("v"))
      .agg(count(lit(1)).as("cnt"))
    val mm = df.groupBy(keyCol)
      .agg(min(col(valueCol)).as("vmin"), max(col(valueCol)).as("vmax"))
    val b = g.join(broadcast(mm), keyCol)
      .withColumn("bucket",
        when(col("vmax") === col("vmin"), lit(0L))
          .otherwise(least(
            floor((col("v") - col("vmin")) / (col("vmax") - col("vmin")) * buckets),
            lit((buckets - 1).toLong))))
    val wb = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bt = b.groupBy(col(keyCol), col("bucket")).agg(sum(col("cnt")).as("bcnt"))
      .withColumn("below_bucket", coalesce(sum(col("bcnt")).over(wb), lit(0L)))
      .select(col(keyCol), col("bucket"), col("below_bucket"))
    val ww = Window.partitionBy(col(keyCol), col("bucket")).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    b.join(broadcast(bt), Seq(keyCol, "bucket"))
      .withColumn("below", col("below_bucket") + coalesce(sum(col("cnt")).over(ww), lit(0L)))
      .select(col(keyCol), col("v"), col("cnt"), col("below"),
        (col("below").cast("double") + (col("cnt") + 1) / lit(2.0)).as("r"))
  }

  /** Exact interpolated percentiles (PERCENTILE_CONT semantics) per
    * key WITHOUT collecting a group's values into one task — Spark's
    * builtin `percentile` aggregate buffers EVERY value of a group in
    * one buffer, the hidden memory cliff of exact quantiles at 100 TB.
    * Here a value tie-group carries its exact rank interval
    * [below+1, below+cnt] from [[tieRanks]]; for h = (n-1)·p the two
    * covering order statistics select by interval membership (keyed
    * joins against a broadcast target table), and the interpolation is
    * one mirrored float expression. Output: one row per (key, pctl).
    */
  def exactPercentiles(df: DataFrame, keyCol: String, valueCol: String,
      ps: Seq[Double], buckets: Int = 1024): DataFrame = {
    val ranked = tieRanks(df.select(col(keyCol), col(valueCol)), keyCol, valueCol, buckets)
    val nTab = df.groupBy(keyCol).agg(count(lit(1)).as("n"))
    val targets = ps.map(p => nTab.withColumn("pctl", lit(p))).reduce(_ unionByName _)
      .withColumn("h", (col("n") - 1).cast("double") * col("pctl"))
      .withColumn("k1", floor(col("h")).cast("long") + 1)
      .withColumn("k2", least(col("k1") + 1, col("n")))
    val joined = ranked.join(broadcast(targets), Seq(keyCol))
    val v1 = joined
      .filter(col("below") < col("k1") && col("k1") <= col("below") + col("cnt"))
      .select(col(keyCol), col("pctl"), col("n"), col("h"), col("v").as("v1"))
    val v2 = joined
      .filter(col("below") < col("k2") && col("k2") <= col("below") + col("cnt"))
      .select(col(keyCol), col("pctl"), col("v").as("v2"))
    v1.join(v2, Seq(keyCol, "pctl"))
      .select(col(keyCol), col("pctl"), col("n"),
        round(col("v1") + (col("h") - floor(col("h"))) * (col("v2") - col("v1")), 6)
          .as("value"))
  }

  /** Exact per-group ORDER STATISTIC at rank ceil(p·n) — the discrete
    * quantile the log sketch's error contract is stated against —
    * distributed via [[tieRanks]] rank intervals (a value tie-group
    * covers ranks [below+1, below+cnt]; the target rank selects by
    * interval membership). No per-group value buffering anywhere.
    * Output: one row per (key, pctl): (keyCol, pctl, v).
    */
  def exactOrderStats(df: DataFrame, keyCol: String, valueCol: String,
      ps: Seq[Double], buckets: Int = 1024): DataFrame = {
    val ranked = tieRanks(df.select(col(keyCol), col(valueCol)), keyCol, valueCol, buckets)
    val nTab = df.groupBy(keyCol).agg(count(lit(1)).as("n"))
    val targets = ps.map(p => nTab.withColumn("pctl", lit(p))).reduce(_ unionByName _)
      .withColumn("k", ceil(col("pctl") * col("n").cast("double")).cast("long"))
    ranked.join(broadcast(targets), Seq(keyCol))
      .filter(col("below") < col("k") && col("k") <= col("below") + col("cnt"))
      .select(col(keyCol), col("pctl"), col("v"))
  }

  /** Exact Spearman rank correlation between two per-row signals,
    * per key group — the signal-agreement audit (do two quality
    * signals order the corpus the same way?). Spearman = Pearson on
    * tie-averaged ranks: both rank tables come from [[tieRanks]]
    * (distributed, never a global sort), ranks join back by value, and
    * the correlation finishes through the exact decimal-backed sum +
    * [[Num.fitCorr]] shape shared with q106 — mirrored 1:1 in the
    * oracle. Output: (keyCol, n, rho).
    */
  /** Mann–Whitney U rank-sum test (Mann & Whitney 1947, Ann. Math.
    * Stat.) between every GROUP PAIR over a per-row signal, with the
    * tie-corrected normal approximation and Cliff's delta effect size —
    * the distribution-free "is feed A genuinely better than feed B?"
    * read a curation team runs on quality scores, where a difference
    * of means (q28-class) is hostage to outliers and a KL divergence
    * (q151) has no significance calibrus. U counts how often an A draw
    * beats a B draw (ties half); z calibrates it; delta = 2U/(n_a·n_b)
    * − 1 is the probability-scaled effect.
    *
    * Exactness: tie-averaged ranks come from [[tieRanks]] (exact rank
    * intervals, never a per-group value buffer); rank sums ride
    * decimals; U and delta are exact rationals rounded once; z is a
    * fixed mirrored IEEE expression. Group pairs are |G|² driver-free
    * rows (sources are few); each row of data joins only its group's
    * pairs, so the expanded table is ≤ |G|−1 copies of the input —
    * linear per group pair, no row-pair space anywhere.
    */
  def mannWhitney(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val srcs = df.select(col(groupCol).cast("string").as("g")).distinct()
    val prs = srcs.as("x").join(srcs.as("y"), col("x.g") < col("y.g"))
      .select(col("x.g").as("ga"), col("y.g").as("gb"))
    // cached: three consumers below (the rank input, the rank join, the
    // tie correction) would otherwise each recompute the ≤(|G|−1)-copy
    // expansion join (guide §1.2)
    val rows = df.select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("v"))
      .join(broadcast(prs), col("g") === col("ga") || col("g") === col("gb"))
      .select(concat(col("ga"), lit("|"), col("gb")).as("pair"),
        col("ga"), col("gb"), col("g"), col("v"))
      .cache()
    val ranked = tieRanks(rows.select(col("pair"), col("v")), "pair", "v")
      .select(col("pair"), col("v"), col("r"))
    val agg = rows.join(ranked, Seq("pair", "v"))
      .groupBy("pair", "ga", "gb").agg(
        count(lit(1)).as("n"),
        sum(when(col("g") === col("ga"), 1L).otherwise(0L)).as("na"),
        Num.dsum(when(col("g") === col("ga"), col("r")).otherwise(lit(0.0))).as("ra"))
    val ties = rows.groupBy("pair", "v").agg(count(lit(1)).as("t"))
      .groupBy("pair").agg(sum(col("t") * col("t") * col("t") - col("t")).as("tcorr"))
    agg.join(ties, "pair")
      .withColumn("nb", col("n") - col("na"))
      .withColumn("u",
        col("ra") - col("na").cast("double") * (col("na") + 1).cast("double") / lit(2.0))
      .withColumn("varu",
        col("na").cast("double") * col("nb").cast("double") / lit(12.0) *
          ((col("n") + 1).cast("double") -
            col("tcorr").cast("double") /
              (col("n").cast("double") * (col("n") - 1).cast("double"))))
      .select(col("ga").as("source_a"), col("gb").as("source_b"),
        col("na"), col("nb"), round(col("u"), 6).as("u"),
        round(when(col("varu") > 0,
          (col("u") - col("na").cast("double") * col("nb").cast("double") / lit(2.0))
            / sqrt(col("varu"))), 6).as("z"),
        round(lit(2.0) * col("u") /
          (col("na").cast("double") * col("nb").cast("double")) - lit(1.0), 6)
          .as("cliffs_delta"))
      .orderBy("source_a", "source_b")
  }

  def spearman(df: DataFrame, keyCol: String, xCol: String, yCol: String,
      buckets: Int = 1024): DataFrame = {
    val rx = tieRanks(df.select(col(keyCol), col(xCol)), keyCol, xCol, buckets)
      .select(col(keyCol), col("v").as(xCol), col("r").as("rx"))
    val ry = tieRanks(df.select(col(keyCol), col(yCol)), keyCol, yCol, buckets)
      .select(col(keyCol), col("v").as(yCol), col("r").as("ry"))
    val ranked = df.select(col(keyCol), col(xCol), col(yCol))
      .join(rx, Seq(keyCol, xCol))
      .join(ry, Seq(keyCol, yCol))
    val g = ranked.groupBy(keyCol).agg(
      count(lit(1)).cast("double").as("n"),
      Num.dsum(col("rx")).as("sx"), Num.dsum(col("ry")).as("sy"),
      Num.dsum(col("rx") * col("rx")).as("sxx"),
      Num.dsum(col("ry") * col("ry")).as("syy"),
      Num.dsum(col("rx") * col("ry")).as("sxy"))
    g.select(col(keyCol), col("n").cast("long").as("n"),
      round(Num.fitCorr(col("n"), col("sx"), col("sy"), col("sxx"), col("sxy"),
        col("syy")), 6).as("rho"))
  }

  // ------------------------------------------------------- log2-linear quantile sketch

  /** Sub-bucket resolution of the log2-linear quantile sketch: each
    * power-of-two octave splits into 2^LogSubBits equal-width linear
    * sub-buckets (the HdrHistogram bucket layout — Tene,
    * github.com/HdrHistogram, public), so a bucket's width is always
    * ≤ value · 2^-LogSubBits and the midpoint estimate is within
    * **2^-(LogSubBits+1) ≈ 0.79 % RELATIVE error** of the target order
    * statistic — at ANY positive-long magnitude. This is the property
    * the fixed-domain [[histBinCounts]] sketch cannot offer: that one
    * needs [HistLo, HistHi) chosen in advance and clamps outside it,
    * while this one covers 1 .. 2^62 with ≤ (62-6)·64+128 ≈ 3.7k
    * counters and needs NO domain knowledge. Both sketches share the
    * scale contract: per-group counters only (map-side partial
    * aggregation, mergeable across partitions / micro-batches /
    * ingestion days by plain count addition).
    *
    * Determinism: the bucket index and the midpoint estimate are PURE
    * INTEGER bit math (floor(log2 x) via the binary-string length of
    * the builtin `bin`, shifts for the rest — no transcendental calls,
    * no doubles anywhere), so a DuckDB replay is exact by construction,
    * not within-an-ulp.
    *
    * Domain: values must be in [1, 2^62) — NULLs and values < 1 are
    * dropped (rank information only exists for positive counts/sizes:
    * lengths, token counts, byte sizes, latencies-in-µs).
    */
  val LogSubBits = 6
  private val LogSubCount = 1L << LogSubBits

  private def shiftRightVar(x: Column, s: Column): Column = {
    import org.apache.spark.sql.classic.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.ShiftRightUnsigned
    GraftBridge.column(ShiftRightUnsigned(
      GraftBridge.expression(x), GraftBridge.expression(s.cast("int"))))
  }

  private def shiftLeftVar(x: Column, s: Column): Column = {
    import org.apache.spark.sql.classic.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.ShiftLeft
    GraftBridge.column(ShiftLeft(
      GraftBridge.expression(x), GraftBridge.expression(s.cast("int"))))
  }

  /** Bucket index of a positive long: identity below 2^LogSubBits
    * (small values are EXACT), else (e-m)·2^m + (x >> (e-m)) with
    * e = floor(log2 x) — monotone in x, so bucket order is value order
    * and cumulative counts give ranks.
    */
  def logBin(x: Column): Column = {
    val xl = x.cast("long")
    val e = (length(bin(xl)) - lit(1)).cast("long")
    when(xl < LogSubCount, xl)
      .otherwise((e - LogSubBits) * LogSubCount + shiftRightVar(xl, e - LogSubBits))
  }

  /** Integer midpoint of bucket `idx` — the quantile estimate. Buckets
    * below 2·2^m are single-valued (estimate = the value itself); above,
    * the bucket spans [sub<<shift, (sub+1)<<shift) and the midpoint is
    * one >>1 away.
    */
  def logBinMid(idx: Column): Column = {
    val block = shiftright(idx, LogSubBits)
    val shiftAmt = block - 1
    val sub = idx - shiftAmt * LogSubCount
    val lower = shiftLeftVar(sub, shiftAmt)
    val upper = shiftLeftVar(sub + 1, shiftAmt) - 1
    when(idx < 2 * LogSubCount, idx).otherwise(shiftright(lower + upper, 1))
  }

  /** Sketch-building half (the [[histBinCounts]] shape on log2-linear
    * buckets): per-group bucket counters as one keyed aggregation —
    * streaming-compatible (update/complete-mode groupBy, no windows).
    */
  def logBinCounts(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull && col(valueCol) >= 1)
      .select(col(groupCol), logBin(col(valueCol)).as("lbin"))
      .groupBy(col(groupCol), col("lbin")).agg(count(lit(1)).as("c"))

  /** Per-group quantile ESTIMATES from the log2-linear sketch: target
    * rank ceil(p·n) (the [[estimateFromBins]] convention), first bucket
    * whose cumulative count reaches it, integer midpoint out. The
    * cumulative runs over the ≤3.7k-row-per-group bucket table, never
    * the data.
    */
  def logQuantile(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame =
    logEstimateFromBins(logBinCounts(df, groupCol, valueCol), groupCol, ps)

  /** Estimate half, callable on a persisted / stream-accumulated
    * (group, lbin, c) counter table.
    */
  def logEstimateFromBins(binned: DataFrame, groupCol: String,
      ps: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def pName(p: Double) = s"p${math.round(p * 100)}"
    val wCum = Window.partitionBy(groupCol).orderBy("lbin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cums = binned
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(groupCol)))
    val sels = ps.map { p =>
      val t = ceil(lit(p) * col("n").cast("double"))
      min(when(col("cum") >= t, col("lbin"))).as(s"sel_${pName(p)}")
    }
    val g = cums.groupBy(groupCol).agg(max(col("n")).as("n"), sels: _*)
    ps.foldLeft(g) { (acc, p) =>
      acc.withColumn(s"est_${pName(p)}", logBinMid(col(s"sel_${pName(p)}")))
    }.drop(ps.map(p => s"sel_${pName(p)}"): _*)
  }

  /** Robust scale (MAD) from the log sketch — the bounded-memory path
    * around [[madOutliers]], whose builtin `percentile` buffers every
    * group value in one task. Two counter-table passes: the sketch
    * median m̂ per group, then a sketch over |x − m̂| + 1 (the +1 shift
    * keeps zero deviations inside the sketch's positive domain;
    * monotone, so deviation RANKS are exact and only the estimate
    * carries the relative-error contract, now on dev+1). Input values
    * must be positive longs (callers pre-scale doubles to integer
    * units and filter >= 1, mirrored in the oracle).
    * Output: (group, n, med_est, mad_est).
    */
  def sketchMad(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val med = logQuantile(df, groupCol, valueCol, Seq(0.5))
      .select(col(groupCol), col("est_p50").as("med_est"))
    val dev = df.join(broadcast(med), groupCol)
      .select(col(groupCol), (abs(col(valueCol) - col("med_est")) + 1).as("dev1"))
    logQuantile(dev, groupCol, "dev1", Seq(0.5))
      .select(col(groupCol), col("n"), (col("est_p50") - 1).as("mad_est"))
      .join(broadcast(med), groupCol)
      .select(col(groupCol), col("n"), col("med_est"), col("mad_est"))
  }

  /** Per-group MAD outlier stats: median, median-absolute-deviation,
    * and the count of values beyond `k` MADs.
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 3.0): DataFrame = {
    val med = df.groupBy(groupCol)
      .agg(round(percentile(col(valueCol), lit(0.5)), 6).as("med"))
    val withDev = df.join(broadcast(med), groupCol)
      .withColumn("adev", abs(col(valueCol) - col("med")))
    val mad = withDev.groupBy(groupCol)
      .agg(round(percentile(col("adev"), lit(0.5)), 6).as("mad"))
    withDev.join(broadcast(mad), groupCol)
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n"),
        first(col("med")).as("med"),
        first(col("mad")).as("mad"),
        sum(when(col("adev") > lit(k) * col("mad"), 1L).otherwise(0L)).as("n_outliers"))
  }
}
