package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word-level longest-common-subsequence LENGTH between two texts —
  * the ROUGE-L kernel. Tokenization is the engine-wide space split
  * (limit -1, so empty tokens survive exactly as in `split(text, ' ')`
  * / DuckDB's string_split). Classic two-row O(n·m) DP; integer
  * output, so there are no float-parity concerns. The oracle twin is a
  * DuckDB unrolled-CTE replay of the same recurrence in the
  * in-row-dependency-free form dp[i][j] = max(dp[i-1][j],
  * max_{k≤j, b_k=a_i}(dp[i-1][k-1]+1)) — value-identical to the
  * textbook three-way recurrence.
  *
  * Codegen emits one static kernel call (the DamerauLevenshtein
  * convention): the expression stays inside whole-stage codegen.
  */
case class WordLcs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "word_lcs"

  override def nullSafeEval(a: Any, b: Any): Any =
    WordLcs.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.expressions.WordLcs$$.MODULE$$.compute($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordLcs =
    copy(left = newLeft, right = newRight)
}

object WordLcs {

  /** The scalar kernel (also the interpreted path): two-row LCS DP
    * over space-split word sequences.
    */
  def compute(u1: UTF8String, u2: UTF8String): Int = {
    val a = u1.toString.split(" ", -1)
    val b = u2.toString.split(" ", -1)
    val n = a.length
    val m = b.length
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      var j = 1
      while (j <= m) {
        cur(j) =
          if (a(i - 1) == b(j - 1)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    prev(m)
  }
}
