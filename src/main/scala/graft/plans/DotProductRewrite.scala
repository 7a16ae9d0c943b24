package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.expressions.DotProductD

/** Optimizer rule: rewrites the generic dot-product fold
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0, (acc, v) -> acc + v)
  *
  * over float arrays into the codegen'd primitive-loop [[DotProductD]].
  * Users (and the SQL surface) write the declarative higher-order form;
  * the engine runs the tight loop — the same contract as any other
  * Catalyst optimization, made safe by the two expressions' proven
  * bit-equality (PipelineSpec) including the NULL-on-length-mismatch
  * case (zip_with pads the short side with nulls, which nulls the fold;
  * DotProductD returns null on mismatch directly).
  *
  * Registered by [[graft.core.GraftExtensions]] (injectOptimizerRule)
  * and, for externally-built sessions, via
  * `spark.experimental.extraOptimizations` in GraftSession.tune.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** double(x) * double(y) over exactly the two lambda variables. */
  private def isElementProduct(body: Expression, x: NamedLambdaVariable, y: NamedLambdaVariable): Boolean =
    body match {
      case Multiply(Cast(xv: NamedLambdaVariable, DoubleType, _, _),
                    Cast(yv: NamedLambdaVariable, DoubleType, _, _), _) =>
        (xv.exprId == x.exprId && yv.exprId == y.exprId) ||
          (xv.exprId == y.exprId && yv.exprId == x.exprId)
      case _ => false
    }

  private def isAccPlusElem(body: Expression, acc: NamedLambdaVariable, v: NamedLambdaVariable): Boolean =
    body match {
      case Add(a: NamedLambdaVariable, b: NamedLambdaVariable, _) =>
        (a.exprId == acc.exprId && b.exprId == v.exprId) ||
          (a.exprId == v.exprId && b.exprId == acc.exprId)
      case _ => false
    }

  private def isIdentity(finish: Expression): Boolean = finish match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      body.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(left, right, LambdaFunction(prod, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(merge, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          finish)
        if isFloatArray(left) && isFloatArray(right) &&
          isElementProduct(prod, x, y) && isAccPlusElem(merge, acc, v) && isIdentity(finish) =>
      DotProductD(left, right)
  }
}
