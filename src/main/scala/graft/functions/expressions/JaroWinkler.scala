package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a codegen'd expression — the
  * typo-tolerant string metric the fuzzy-dedup family lacks a Spark
  * built-in for (levenshtein counts EDITS; Jaro–Winkler scores
  * positional agreement with a common-prefix bonus, the standard
  * record-linkage metric since Winkler 1990).
  *
  * Algorithm parity is with DuckDB's `jaro_winkler_similarity` (the
  * cross-engine oracle): standard Jaro over the match window
  * ⌊max(|a|,|b|)/2⌋−1 with left-to-right greedy matching, transposition
  * halving, prefix bonus p=0.1 over the first ≤4 chars applied above
  * the 0.7 boost threshold, and EITHER-EMPTY → 0 (including
  * empty-vs-empty, which a naive equality shortcut would score 1 —
  * fuzz-verified against DuckDB at 6 dp over random and near-dup pair
  * sets before this shipped).
  *
  * Codegen emits one static call into [[JaroWinkler.compute]] — the
  * expression stays inside whole-stage codegen (no interpreted
  * fallback); the loop itself is branchy enough that inlining it as
  * generated Java would bloat the method past the JIT inline budget
  * for no gain.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.expressions.JaroWinkler$$.MODULE$$.compute($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** The scalar kernel (also the interpreted path). Char-level over the
    * decoded string — byte-identical to char-identical on the ASCII
    * corpus the oracle compares.
    */
  def compute(u1: UTF8String, u2: UTF8String): Double = {
    val s1 = u1.toString
    val s2 = u2.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val win = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - win)
      val hi = math.min(l2, i + win + 1)
      var j = lo
      var matched = false
      while (j < hi && !matched) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t / 2) / md) / 3.0
    var l = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (l < maxP && s1.charAt(l) == s2.charAt(l)) l += 1
    if (jaro > 0.7) jaro + l * 0.1 * (1.0 - jaro) else jaro
  }
}
