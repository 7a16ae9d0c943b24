package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.{CmsSketch, DamerauLevenshtein, DotProductD, HllSketch, JaroWinkler, KmvSketch, TopKByScore, WordEditDistance, WordLcs, ZOrder2}

/** Catalyst extension point: registers graft's custom expressions with
  * the SQL function registry, so `spark.sql("SELECT dot_product_d(a,b)")`
  * works the same as the DataFrame API (`Vec.dotFast`).
  *
  * Activation (either path):
  *   - `SparkSession.builder().withExtensions(new GraftExtensions)`
  *   - `--conf spark.sql.extensions=graft.core.GraftExtensions`
  *     (spark-submit / spark-shell, no code change)
  *
  * GraftSession.builder applies it automatically.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.DotProductRewrite)
    ext.injectOptimizerRule(_ => graft.plans.BandJoinRewrite)
  }
}

object GraftExtensions {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  /** The registry entries, shared by the extension and by
    * `registerAll` (for sessions built outside our builder).
    */
  val functions: Seq[FunctionDescription] = Seq(
    (
      FunctionIdentifier("dot_product_d"),
      new ExpressionInfo(classOf[DotProductD].getCanonicalName, null, "dot_product_d"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "dot_product_d takes exactly 2 arguments")
        DotProductD(children.head, children(1))
      }),
    (
      FunctionIdentifier("hll_md5"),
      new ExpressionInfo(classOf[HllSketch].getCanonicalName, null, "hll_md5"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "hll_md5 takes exactly 1 argument")
        // The analyzer wraps a bare AggregateFunction in its
        // AggregateExpression during function resolution.
        HllSketch.forInput(children.head)
      }),
    (
      FunctionIdentifier("topk_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getCanonicalName, null, "topk_by_score"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "topk_by_score takes (score, id, k)")
        val k = children(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => other.eval(null).asInstanceOf[Number].intValue()
        }
        TopKByScore(children.head, children(1), k)
      }),
    (
      FunctionIdentifier("kmv_md5"),
      new ExpressionInfo(classOf[KmvSketch].getCanonicalName, null, "kmv_md5"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "kmv_md5 takes (value, k)")
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => other.eval(null).asInstanceOf[Number].intValue()
        }
        KmvSketch.forInput(children.head, k)
      }),
    (
      FunctionIdentifier("cms_md5"),
      new ExpressionInfo(classOf[CmsSketch].getCanonicalName, null, "cms_md5"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "cms_md5 takes exactly 1 argument")
        CmsSketch.forInput(children.head)
      }),
    (
      FunctionIdentifier("damerau_levenshtein"),
      new ExpressionInfo(classOf[DamerauLevenshtein].getCanonicalName, null, "damerau_levenshtein"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "damerau_levenshtein takes exactly 2 arguments")
        DamerauLevenshtein(children.head, children(1))
      }),
    (
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getCanonicalName, null, "jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "jaro_winkler takes exactly 2 arguments")
        JaroWinkler(children.head, children(1))
      }),
    (
      FunctionIdentifier("word_lcs"),
      new ExpressionInfo(classOf[WordLcs].getCanonicalName, null, "word_lcs"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "word_lcs takes exactly 2 arguments")
        WordLcs(children.head, children(1))
      }),
    (
      FunctionIdentifier("word_edit_distance"),
      new ExpressionInfo(classOf[WordEditDistance].getCanonicalName, null, "word_edit_distance"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "word_edit_distance takes exactly 2 arguments")
        WordEditDistance(children.head, children(1))
      }),
    (
      FunctionIdentifier("zorder2"),
      new ExpressionInfo(classOf[ZOrder2].getCanonicalName, null, "zorder2"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "zorder2 takes exactly 2 arguments")
        ZOrder2(children.head, children(1))
      }))

  /** Runtime registration for an externally-built session (the driver's
    * Verify/Bench sessions can't pass builder extensions).
    */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
