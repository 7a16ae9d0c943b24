package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Morton (Z-order) interleave of the low 32 bits of two long columns —
  * the multi-dimensional sort key that makes parquet min/max row-group
  * stats prune on BOTH columns at once. Sorting 100 TB by
  * `zorder2(device_bucket, day_bucket)` before writing gives range scans
  * on either dimension ~sqrt locality instead of full scans — the plain-
  * parquet answer to the reference warehouse's (device, time) chunking.
  *
  * Pure bit arithmetic (magic-number spread), codegen'd, null-safe.
  */
case class ZOrder2(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.morton(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val spread = ctx.addNewFunction("graftZSpread",
      s"""
         |private long graftZSpread(long x) {
         |  x &= 0xffffffffL;
         |  x = (x | (x << 16)) & 0x0000ffff0000ffffL;
         |  x = (x | (x << 8))  & 0x00ff00ff00ff00ffL;
         |  x = (x | (x << 4))  & 0x0f0f0f0f0f0f0f0fL;
         |  x = (x | (x << 2))  & 0x3333333333333333L;
         |  x = (x | (x << 1))  & 0x5555555555555555L;
         |  return x;
         |}
       """.stripMargin)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $spread($a) | ($spread($b) << 1);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {

  private def spread(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Reference implementation (used by eval and the spec). */
  def morton(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  /** DuckDB oracle SQL for the same interleave (bit-identical): emits
    * the 5-stage magic-number spread as chained CTE columns.
    * `inner` must provide columns `xa` and `xb` (the two low-32-bit
    * inputs); the result column is `z`.
    */
  def oracleCtes(inner: String): String = {
    val masks = Seq(
      281470681808895L -> 16, 71777214294589695L -> 8,
      1085102592571150095L -> 4, 3689348814741910323L -> 2,
      6148914691236517205L -> 1)
    val stages = masks.zipWithIndex.map { case ((m, sh), i) =>
      s"z${i + 1} AS (SELECT * REPLACE (((xa | (xa << $sh)) & $m) AS xa, ((xb | (xb << $sh)) & $m) AS xb) FROM z$i)"
    }
    (s"z0 AS (SELECT * REPLACE ((xa & 4294967295) AS xa, (xb & 4294967295) AS xb) FROM ($inner))" +:
      stages :+ "zf AS (SELECT *, (xa | (xb << 1)) AS z FROM z5)").mkString(",\n")
  }
}
