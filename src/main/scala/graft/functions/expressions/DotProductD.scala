package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product over two float-array columns, accumulating in
  * double with a strict left-to-right fold — numerically identical to
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` and to DuckDB's
  * `list_reduce`, but a single tight primitive loop with no intermediate
  * array allocation (SURVEY §7.3: the one operator where custom Catalyst
  * is justified).
  *
  * Null ELEMENTS inside the arrays are not expected (embedding vectors);
  * null array inputs propagate null via nullSafeEval/nullSafeCodeGen.
  * Mismatched array lengths yield NULL — same as the zip_with/aggregate
  * fold — so a dimension bug upstream surfaces instead of producing a
  * plausible-but-wrong truncated score.
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {

  // Callers must supply array<float> children (library-internal — used
  // via graft.functions.Vec.dotFast only).
  override def dataType: DataType = DoubleType

  // Nullable even for non-null children: length mismatch produces NULL.
  override def nullable: Boolean = true

  override def prettyName: String = "dot_product_d"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)
}
