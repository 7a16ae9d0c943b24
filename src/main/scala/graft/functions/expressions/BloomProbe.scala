package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Membership probe against a [[BloomSketch]] word array: true iff all
  * [[BloomSketch.K]] probe bits of the key are set.
  *
  * Why a custom expression instead of column arithmetic: the probe
  * sits in the FILTER of a big scan, and a column-arithmetic spelling
  * (`shiftright(element_at(...md5(key)...))` per probe bit) embeds the
  * md5 subtree once PER PROBE BIT — and FilterExec's generated code
  * short-circuits conjuncts, so common-subexpression elimination never
  * merges them: the probe paid K md5s per row (measured 3.5× the cost
  * of the whole plain semi join it was supposed to beat). Here the
  * digest runs exactly once per row in a tight JVM call — no hex
  * string, no conv() decimal parse — and the K probes are integer
  * shift/mask over the array words.
  *
  * Hashing is bit-identical to [[BloomSketch.update]] (md5 of the
  * key's string rendering, top 60 bits big-endian, K disjoint 12-bit
  * position slices), so a probe verdict — and any false-positive
  * census built on it — still replays exactly in the DuckDB oracle.
  */
case class BloomProbe(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // analysis-time contract: word array + string key — a wrong bloom
  // column (not array<bigint>) or an uncast key fails as an
  // AnalysisException instead of a runtime ClassCastException
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), StringType)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "bloom_probe"

  override def nullSafeEval(bloom: Any, key: Any): Any =
    BloomProbe.probe(bloom.asInstanceOf[ArrayData], key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, k) =>
      s"${ev.value} = graft.functions.expressions.BloomProbe.probe($b, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomProbe =
    copy(left = newLeft, right = newRight)
}

object BloomProbe {

  /** One digest instance per thread — MessageDigest is not
    * thread-safe and per-row allocation would dominate the probe.
    */
  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** The per-row probe: md5 of the utf8 key bytes, top 60 bits
    * (identical to BloomSketch.update / Hashes.md5Long60), K 12-bit
    * position slices checked against the word array.
    */
  def probe(words: ArrayData, key: UTF8String): Boolean = {
    import BloomSketch.{K, M}
    val d = md.get().digest(key.getBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h = h >>> 4
    i = 0
    while (i < K) {
      val pos = ((h >>> (12 * i)) & (M - 1)).toInt
      if ((words.getLong(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Canonical constructor: probe the key's SQL string rendering — the
    * same convention as [[BloomSketch.forInput]], so build and probe
    * hash identical bytes for any input type.
    */
  def forInput(bloom: Expression, key: Expression): BloomProbe =
    BloomProbe(bloom,
      if (key.dataType == StringType) key else Cast(key, StringType))
}
