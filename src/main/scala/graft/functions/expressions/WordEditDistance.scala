package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word-level Levenshtein distance between two texts — the WER kernel
  * (substitution/insertion/deletion at word granularity; Spark's
  * built-in `levenshtein` is character-level). Tokenization is the
  * engine-wide space split (limit -1). Two-row O(n·m) DP; integer
  * output. The oracle twin replays the recurrence in the
  * in-row-dependency-free form dp[i][j] = min_{k≤j}(seed[k] + (j−k))
  * with seed[k] = min(dp[i−1][k]+1, dp[i−1][k−1]+cost) and seed[0] = i
  * — exact: a path enters row i exactly once, at column k, and moves
  * only right (insertions) afterwards.
  *
  * Codegen emits one static kernel call (the DamerauLevenshtein
  * convention).
  */
case class WordEditDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "word_edit_distance"

  override def nullSafeEval(a: Any, b: Any): Any =
    WordEditDistance.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.expressions.WordEditDistance$$.MODULE$$.compute($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordEditDistance =
    copy(left = newLeft, right = newRight)
}

object WordEditDistance {

  /** The scalar kernel (also the interpreted path): two-row Levenshtein
    * DP over space-split word sequences.
    */
  def compute(u1: UTF8String, u2: UTF8String): Int = {
    val a = u1.toString.split(" ", -1)
    val b = u2.toString.split(" ", -1)
    val n = a.length
    val m = b.length
    var prev = Array.tabulate(m + 1)(identity)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      cur(0) = i
      var j = 1
      while (j <= m) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }
}
