package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic numeric helpers.
  *
  * Double summation is order-dependent, and Spark's shuffle order differs
  * run-to-run and engine-to-engine — a plain `sum(double)` can never
  * hash-match an external oracle. Every "money/measure" aggregate here is
  * therefore computed as an EXACT decimal sum (inputs are fixed-point-ish:
  * 2-decimal prices/values) and only converted to double at the end, which
  * makes results bit-reproducible regardless of partitioning, parallelism,
  * or engine. avg/stddev are derived from those exact sums with a fixed
  * expression shape mirrored verbatim in the DuckDB oracle SQL.
  *
  * Everything stays inside whole-stage codegen (built-in expressions only).
  */
object Num {
  private val Dec: DecimalType = DecimalType(38, 6)

  /** Order-independent exact sum, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  private val DecHi: DecimalType = DecimalType(38, 18)

  /** [[dsum]] at 18-dp scale, for unit-magnitude per-row terms
    * (probability masses, divergence contributions) where 6 dp would
    * truncate the signal away. Headroom: 10^20 — fine for sums of
    * per-word probabilities, wrong for money columns.
    */
  def dsumHi(c: Column): Column = sum(c.cast(DecHi)).cast(DoubleType)

  def dsumOver(c: Column, w: WindowSpec): Column = sum(c.cast(Dec)).over(w).cast(DoubleType)

  /** Mean from the exact sum (deterministic double division). */
  def davg(c: Column): Column = dsum(c) / count(c)

  def davgOver(c: Column, w: WindowSpec): Column = dsumOver(c, w) / count(c).over(w)

  /** Sample stddev from exact sums of x and x^2:
    * sqrt(max(S2 - S^2/n, 0) / (n-1)), NULL for n<=1 (mirrors
    * stddev_samp / reference guard at spark_transform.py:168-170).
    */
  def dstddev(c: Column): Column = {
    val n = count(c).cast(DoubleType)
    val s = dsum(c)
    val s2 = dsum(c * c)
    when(count(c) > 1, sqrt(greatest(s2 - (s * s) / n, lit(0d)) / (n - lit(1d))))
  }

  /** Windowed sample stddev with the same exact-sums formula. */
  def dstddevOver(c: Column, w: WindowSpec): Column = {
    val n = count(c).over(w).cast(DoubleType)
    val s = dsumOver(c, w)
    val s2 = dsumOver(c * c, w)
    when(count(c).over(w) > 1, sqrt(greatest(s2 - (s * s) / n, lit(0d)) / (n - lit(1d))))
  }

  /** Least-squares fit from exact aggregate sums (n as double, the s*
    * columns from dsum): one shared expression shape for every
    * regression-flavored operator, mirrored 1:1 in `O.fit*` so a parity
    * tweak can never drift the Scala and oracle forms apart. Callers
    * round the results (6 dp).
    */
  def fitSlope(n: Column, sx: Column, sy: Column, sxx: Column, sxy: Column): Column =
    (n * sxy - sx * sy) / (n * sxx - sx * sx)

  def fitIntercept(n: Column, sx: Column, sy: Column, sxx: Column, sxy: Column): Column =
    (sy - fitSlope(n, sx, sy, sxx, sxy) * sx) / n

  def fitCorr(n: Column, sx: Column, sy: Column, sxx: Column, sxy: Column,
      syy: Column): Column =
    (n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))

  /** Matching DuckDB oracle fragments — kept adjacent so the two engines'
    * expression shapes cannot drift apart. `over` ("" for plain
    * aggregation, " OVER w" for windows) is appended to each aggregate.
    */
  object O {
    def sum(c: String, over: String = ""): String =
      s"CAST(SUM(CAST($c AS DECIMAL(38,6)))$over AS DOUBLE)"
    def sumHi(c: String, over: String = ""): String =
      s"CAST(SUM(CAST($c AS DECIMAL(38,18)))$over AS DOUBLE)"
    def avg(c: String, over: String = ""): String =
      s"(${sum(c, over)} / COUNT($c)$over)"
    def fitSlope(n: String = "n", sx: String = "sx", sy: String = "sy",
        sxx: String = "sxx", sxy: String = "sxy"): String =
      s"(($n * $sxy - $sx * $sy) / ($n * $sxx - $sx * $sx))"
    def fitIntercept(n: String = "n", sx: String = "sx", sy: String = "sy",
        sxx: String = "sxx", sxy: String = "sxy"): String =
      s"(($sy - ${fitSlope(n, sx, sy, sxx, sxy)} * $sx) / $n)"
    def fitCorr(n: String = "n", sx: String = "sx", sy: String = "sy",
        sxx: String = "sxx", sxy: String = "sxy", syy: String = "syy"): String =
      s"(($n * $sxy - $sx * $sy) / sqrt(($n * $sxx - $sx * $sx) * ($n * $syy - $sy * $sy)))"
    def stddev(c: String, over: String = ""): String = {
      val n = s"CAST(COUNT($c)$over AS DOUBLE)"
      val s = sum(c, over)
      val s2 = s"CAST(SUM(CAST(($c * $c) AS DECIMAL(38,6)))$over AS DOUBLE)"
      s"CASE WHEN COUNT($c)$over > 1 THEN sqrt(greatest($s2 - ($s * $s) / $n, 0.0) / ($n - 1.0)) END"
    }
  }
}

/** Portable hashing built on md5 (identical across Spark and DuckDB),
  * used by the dedup family (MinHash / SimHash / fingerprints).
  * At scale these are pure codegen'd expressions — no UDFs.
  */
object Hashes {

  /** First 32 bits of md5(c) as an unsigned long in [0, 2^32). */
  def md5Long32(c: Column): Column = conv(substring(md5(c), 1, 8), 16, 10).cast(LongType)

  /** First 60 bits of md5(c) as a non-negative long (fits BIGINT). */
  def md5Long60(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  object O {
    def md5Long32(c: String): String = s"(('0x' || substr(md5($c), 1, 8))::BIGINT)"
    def md5Long60(c: String): String = s"(('0x' || substr(md5($c), 1, 15))::BIGINT)"
  }
}

/** Dense-vector math over ArrayType columns using codegen'd higher-order
  * functions (zip_with/aggregate) — no UDFs, no driver-side loops.
  * Folds are sequential left-to-right, matching DuckDB's list_reduce, so
  * dot products are bit-identical across engines.
  */
/** Storage-layout helpers. */
object Layout {

  /** Morton (Z-order) key of two long columns' low 32 bits — sort by
    * this before writing so parquet min/max stats prune on both
    * dimensions (graft.functions.expressions.ZOrder2).
    */
  def zorder2(a: Column, b: Column): Column = {
    import org.apache.spark.sql.classic.GraftBridge
    GraftBridge.column(
      graft.functions.expressions.ZOrder2(GraftBridge.expression(a), GraftBridge.expression(b)))
  }
}

/** Mergeable sketches with cross-engine-exact contracts. */
object Sketch {

  /** Deterministic HyperLogLog distinct estimate (see
    * graft.functions.expressions.HllSketch) — the approximate count
    * itself hash-matches the DuckDB oracle.
    */
  def hllMd5(c: Column): Column = {
    import org.apache.spark.sql.classic.GraftBridge
    GraftBridge.column(
      graft.functions.expressions.HllSketch.forInput(GraftBridge.expression(c))
        .toAggregateExpression())
  }

  /** Bounded top-k-per-group aggregate (score DESC, id ASC) — the
    * map-side-combinable replacement for the `row_number <= k` window
    * idiom (graft.functions.expressions.TopKByScore).
    *
    * NULL and NaN scores are excluded inside the aggregate (see
    * TopKByScore.update) — this applies to EVERY caller (windowed
    * top-k, Hill estimator, event top-5, ANN searches), not just
    * expensive-score paths: a group whose candidates are all NULL/NaN
    * returns an empty array, where a raw row_number window would rank
    * NaN greatest.
    */
  def topKByScore(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.classic.GraftBridge
    GraftBridge.column(
      graft.functions.expressions.TopKByScore(
        GraftBridge.expression(score), GraftBridge.expression(id), k).toAggregateExpression())
  }

  /** Deterministic Count-Min Sketch counter table (see
    * graft.functions.expressions.CmsSketch): array<bigint> of
    * Depth x Width bucket counters, mergeable across partitions and
    * micro-batches; pair with [[cmsEstimate]] for point estimates.
    */
  def cmsMd5(c: Column): Column = {
    import org.apache.spark.sql.classic.GraftBridge
    GraftBridge.column(
      graft.functions.expressions.CmsSketch.forInput(GraftBridge.expression(c))
        .toAggregateExpression())
  }

  /** CMS point estimate of `key`'s count from a [[cmsMd5]] counter
    * array: min over the key's Depth buckets — always >= the exact
    * count. Pure codegen'd arithmetic on the same 60-bit md5 hash the
    * sketch used, so the estimate is engine-exact.
    */
  def cmsEstimate(cms: Column, key: Column): Column = {
    import graft.functions.expressions.CmsSketch.{Depth, Width}
    val h = Hashes.md5Long60(key)
    least((0 until Depth).map { r =>
      element_at(cms,
        (shiftright(h, 8 * r).bitwiseAND(lit((Width - 1).toLong)) + lit(r.toLong * Width) + lit(1L))
          .cast(IntegerType))
    }: _*)
  }

  /** CMS inner-product join-size estimate (Cormode & Muthukrishnan
    * 2005, J. Algorithms 55(1) §4.2): |A ⋈ B| on a key = Σ_k fA(k)·fB(k),
    * estimated from the two counter arrays alone as
    * min_r Σ_b A[r][b]·B[r][b]. One-sided like the point estimate
    * (colliding keys only ADD mass), so est >= exact always — the
    * planner reads it BEFORE shuffling either side: two 8 KB sketches
    * stand in for the join, at any corpus size.
    */
  def cmsJoinSize(a: Column, b: Column): Column = {
    import graft.functions.expressions.CmsSketch.{Depth, Width}
    least((0 until Depth).map { r =>
      aggregate(
        zip_with(slice(a, r * Width + 1, Width), slice(b, r * Width + 1, Width),
          (x, y) => x * y),
        lit(0L), (acc, x) => acc + x)
    }: _*)
  }

  object O {
    import graft.functions.expressions.CmsSketch.{Depth, Width}

    /** DuckDB twin of the cmsMd5 counter table: (r, bucket, c) rows from
      * the identical md5-derived hash over `rowsSql` (a relation whose
      * `keyExpr` is the sketched value). A point estimate then joins a
      * candidate's Depth buckets against this and takes MIN(c) — the
      * exact computation cmsEstimate performs on the array.
      */
    def cmsBuckets(rowsSql: String, keyExpr: String): String = {
      val h = Hashes.O.md5Long60(keyExpr)
      s"""SELECT rr.r, ($h >> (8 * rr.r)) & ${Width - 1} AS bucket, COUNT(*) AS c
         |FROM ($rowsSql) CROSS JOIN (SELECT unnest(range(0, $Depth)) AS r) rr
         |GROUP BY 1, 2""".stripMargin
    }

    def bucketOf(keyExpr: String, r: String): String =
      s"(${Hashes.O.md5Long60(keyExpr)} >> (8 * $r)) & ${Width - 1}"

    /** DuckDB twin of [[kmvEstimate]] over (n_kept, kth-hash) columns —
      * the identical CASE + IEEE multiply/divide.
      */
    def kmvEstimate(nKept: String, hk: String, k: Int): String =
      s"""CASE WHEN $nKept < $k THEN CAST($nKept AS DOUBLE)
         |     ELSE CAST(${k - 1} AS DOUBLE) * pow(2.0, 60.0) / CAST($hk AS DOUBLE) END""".stripMargin
  }

  /** Deterministic KMV / bottom-k distinct sketch (see
    * graft.functions.expressions.KmvSketch): array<bigint> of the ≤k
    * smallest distinct 60-bit md5 hashes — a uniform hash-sample of the
    * distinct set, so sketches compose under union/intersection (the
    * set algebra HLL registers cannot do). Mergeable; each map task
    * ships ≤k longs per group.
    */
  def kmvMd5(c: Column, k: Int): Column = {
    import org.apache.spark.sql.classic.GraftBridge
    GraftBridge.column(
      graft.functions.expressions.KmvSketch.forInput(GraftBridge.expression(c), k)
        .toAggregateExpression())
  }

  /** Distinct-count estimate from a [[kmvMd5]] array: exhaustive below
    * k (the sketch IS the distinct set); else the classic k-th-minimum
    * estimator D̂ = (k-1) / F(h_k), F(h) = h / 2^60 (Bar-Yossef 2002).
    * One IEEE multiply + divide, mirrored verbatim in [[O.kmvEstimate]].
    */
  def kmvEstimate(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast(DoubleType))
      .otherwise(lit((k - 1).toDouble) * lit(math.pow(2.0, 60.0)) /
        element_at(sk, k).cast(DoubleType))

  /** Deterministic Bloom filter (see
    * graft.functions.expressions.BloomSketch): array<bigint> of 64
    * bit-words, built over the md5 of each key's string rendering,
    * mergeable by bit-OR. Broadcast one row of this and probe with
    * [[bloomMaybeContains]] to drop most of a big join side map-side
    * before the semi-join shuffle — false positives possible (and
    * hash-checkable), false negatives impossible.
    */
  def bloomMd5(c: Column): Column = {
    import org.apache.spark.sql.classic.GraftBridge
    GraftBridge.column(
      graft.functions.expressions.BloomSketch.forInput(GraftBridge.expression(c))
        .toAggregateExpression())
  }

  /** Membership probe against a [[bloomMd5]] word array: true iff all
    * K probe bits of `key` are set — ONE codegen'd md5 per row + K
    * integer shift/mask checks (graft.functions.expressions.BloomProbe;
    * a column-arithmetic spelling pays K md5s per row because
    * FilterExec's short-circuiting defeats subexpression elimination).
    * Hashing is bit-identical to the builder's, so every probe verdict
    * is engine-exact against the DuckDB position-set replay.
    */
  def bloomMaybeContains(bloom: Column, key: Column): Column = {
    import org.apache.spark.sql.classic.GraftBridge
    GraftBridge.column(graft.functions.expressions.BloomProbe.forInput(
      GraftBridge.expression(bloom), GraftBridge.expression(key)))
  }
}

object Vec {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0d),
      (acc, x) => acc + x)

  /** Same fold as `dot` but as a single codegen'd primitive loop
    * (graft.functions.expressions.DotProductD) — for float-array inputs
    * only. Bit-identical results; ~an order of magnitude less overhead
    * (no intermediate array materialization per row).
    */
  def dotFast(a: Column, b: Column): Column = {
    import org.apache.spark.sql.classic.GraftBridge
    GraftBridge.column(
      graft.functions.expressions.DotProductD(
        GraftBridge.expression(a), GraftBridge.expression(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance, the same sequential left fold shape as [[dot]]
    * (diff*diff per element — no pow(), whose libm paths may differ
    * across engines). Bit-identical to O.l2sq.
    */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b,
        (x, y) => (x.cast(DoubleType) - y.cast(DoubleType)) * (x.cast(DoubleType) - y.cast(DoubleType))),
      lit(0d),
      (acc, x) => acc + x)

  object O {
    /** dim must be the fixed vector length (testdata embeddings: 64). */
    def dot(a: String, b: String, dim: Int = 64): String =
      s"list_reduce(list_transform(range(1, ${dim + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"
    def cosine(a: String, b: String, dim: Int = 64): String =
      s"(${dot(a, b, dim)} / (sqrt(${dot(a, a, dim)}) * sqrt(${dot(b, b, dim)})))"
    def l2sq(a: String, b: String, dim: Int = 64): String =
      s"list_reduce(list_transform(range(1, ${dim + 1}), i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))), (x, y) -> x + y)"
  }
}

/** Text primitives shared by dedup / text-analysis operators. */
object Text {

  def words(c: Column): Column = split(c, " ")

  /** Jaro–Winkler similarity (codegen'd custom expression; algorithm
    * parity with DuckDB's jaro_winkler_similarity — see
    * graft.functions.expressions.JaroWinkler).
    */
  def jaroWinkler(a: Column, b: Column): Column = {
    import org.apache.spark.sql.classic.GraftBridge
    GraftBridge.column(graft.functions.expressions.JaroWinkler(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  }

  /** FULL Damerau–Levenshtein distance (codegen'd custom expression;
    * the variant DuckDB's damerau_levenshtein implements).
    */
  def damerauLevenshtein(a: Column, b: Column): Column = {
    import org.apache.spark.sql.classic.GraftBridge
    GraftBridge.column(graft.functions.expressions.DamerauLevenshtein(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  }

  /** Word-level LCS length (codegen'd custom expression) — the ROUGE-L
    * kernel; space-split tokenization matching [[words]].
    */
  def wordLcs(a: Column, b: Column): Column = {
    import org.apache.spark.sql.classic.GraftBridge
    GraftBridge.column(graft.functions.expressions.WordLcs(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  }

  /** Word-level Levenshtein distance (codegen'd custom expression) —
    * the WER kernel; space-split tokenization matching [[words]].
    */
  def wordEditDistance(a: Column, b: Column): Column = {
    import org.apache.spark.sql.classic.GraftBridge
    GraftBridge.column(graft.functions.expressions.WordEditDistance(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  }

  /** Word n-gram shingles (default 3), matching DuckDB's
    * list_transform(range(1, len(w)-(n-2)), ...) construction.
    */
  def shingles(c: Column, n: Int = 3): Column =
    shinglesOfWords(words(c), n)

  /** [[shingles]] over an already-split words array — for callers that
    * hold a cached words frame and would otherwise re-split the text
    * per n.
    */
  def shinglesOfWords(w: Column, n: Int = 3): Column = {
    val len = size(w) - (n - 1)
    // zip n shifted slices and concat per struct: the split/array
    // expressions evaluate O(n) times per ROW. The obvious
    // transform(sequence, i -> concat_ws(element_at(w, i+k)...)) form
    // re-evaluates `w` (the full split) inside the lambda — n times per
    // ELEMENT, ~150 splits per doc — and measured 6.5× slower end-to-end
    // on the shingling-heavy dedup family. Values are identical.
    val zipped = arrays_zip((0 until n).map(k => slice(w, lit(k + 1), len)): _*)
    when(
      size(w) >= n,
      transform(zipped, s => concat_ws(" ", (0 until n).map(k => s.getField(k.toString)): _*)))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  object O {
    def words(c: String): String = s"string_split($c, ' ')"
    def shingles(c: String, n: Int = 3): String = {
      val parts = (0 until n).map(k => if (k == 0) "w[i]" else s"w[i+$k]").mkString(" || ' ' || ")
      s"list_transform(range(1, len(w) - ${n - 2}), i -> $parts)"
    }
  }
}

/** Derived time features (reference: spark_transform.py:103-107).
  * Spark's dayofweek is 1=Sunday..7=Saturday; DuckDB's dayofweek is
  * 0=Sunday..6=Saturday — the oracle fragments compensate.
  */
object TimeF {
  def hourOf(ts: Column): Column = hour(ts)
  def dow(ts: Column): Column = dayofweek(ts)
  def isWeekend(ts: Column): Column = dayofweek(ts).isin(1, 7)
  def isBusinessHours(ts: Column): Column = hour(ts).between(9, 17)

  object O {
    def hourOf(ts: String): String = s"CAST(hour($ts) AS INT)"
    def dow(ts: String): String = s"CAST(dayofweek($ts) + 1 AS INT)"
    def isWeekend(ts: String): String = s"(dayofweek($ts) IN (0, 6))"
    def isBusinessHours(ts: String): String = s"(hour($ts) BETWEEN 9 AND 17)"
  }
}
