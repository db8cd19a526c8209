package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.plans.DotProduct

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql("... graft_dot(a, b) ...")`
  * works in any session created with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      GraftExtensions.dotInfo,
      GraftExtensions.dotBuilder))
    ext.injectFunction((
      new FunctionIdentifier("graft_stem"),
      GraftExtensions.stemInfo,
      GraftExtensions.stemBuilder))
    ext.injectFunction((
      new FunctionIdentifier("graft_winnow"),
      GraftExtensions.winnowInfo,
      GraftExtensions.winnowBuilder))
    ext.injectFunction((
      new FunctionIdentifier("graft_labels"),
      GraftExtensions.labelsInfo,
      GraftExtensions.labelsBuilder))
    ext.injectFunction((
      new FunctionIdentifier("graft_image_labels"),
      GraftExtensions.imageLabelsInfo,
      GraftExtensions.imageLabelsBuilder))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      GraftExtensions.simhashInfo,
      GraftExtensions.simhashBuilder))
    ext.injectFunction((
      new FunctionIdentifier("graft_dom_text"),
      GraftExtensions.domTextInfo,
      GraftExtensions.domTextBuilder))
    ext.injectFunction((
      new FunctionIdentifier("graft_dom_attr"),
      GraftExtensions.domAttrInfo,
      GraftExtensions.domAttrBuilder))
    ext.injectOptimizerRule(_ => graft.plans.LargeInListToJoinRule())
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {
  private[graft] val dotInfo =
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot")
  private[graft] val dotBuilder: Seq[Expression] => Expression =
    children => DotProduct(children(0), children(1))

  private[graft] val stemInfo =
    new ExpressionInfo(classOf[graft.functions.Stem].getName, "graft_stem")
  private[graft] val stemBuilder: Seq[Expression] => Expression =
    children => graft.functions.Stem(children.head)

  private[graft] val winnowInfo =
    new ExpressionInfo(classOf[graft.functions.Winnow].getName, "graft_winnow")
  private[graft] val winnowBuilder: Seq[Expression] => Expression =
    children => graft.functions.Winnow(children.head)

  private[graft] val labelsInfo =
    new ExpressionInfo(classOf[graft.functions.LabelGen].getName, "graft_labels")
  private[graft] val labelsBuilder: Seq[Expression] => Expression =
    children => graft.functions.LabelGen(children.head)

  private[graft] val imageLabelsInfo =
    new ExpressionInfo(classOf[graft.functions.ImageLabels].getName, "graft_image_labels")
  private[graft] val imageLabelsBuilder: Seq[Expression] => Expression =
    children => graft.functions.ImageLabels(children.head)

  private[graft] val simhashInfo =
    new ExpressionInfo(classOf[graft.functions.SimHash].getName, "graft_simhash")
  private[graft] val simhashBuilder: Seq[Expression] => Expression =
    children => graft.functions.SimHash(children.head)

  /** Arity guard for the SQL builders: a wrong-arity call must surface
    * as a proper analysis error naming the expected signature, not an
    * IndexOutOfBoundsException from children(i) (which Spark reports
    * as an internal error). */
  private def expectArity(name: String, sig: String, n: Int,
      children: Seq[Expression]): Unit =
    if (children.length != n)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> s"$n — the signature is $name$sig",
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  private[graft] val domTextInfo =
    new ExpressionInfo(classOf[graft.functions.DomText].getName, "graft_dom_text")
  private[graft] val domTextBuilder: Seq[Expression] => Expression =
    children => {
      expectArity("graft_dom_text", "(html, selector)", 2, children)
      graft.functions.DomText(children(0), children(1))
    }

  private[graft] val domAttrInfo =
    new ExpressionInfo(classOf[graft.functions.DomAttr].getName, "graft_dom_attr")
  private[graft] val domAttrBuilder: Seq[Expression] => Expression =
    children => {
      expectArity("graft_dom_attr", "(html, selector, attr)", 3, children)
      graft.functions.DomAttr(children(0), children(1), children(2))
    }

  /** Same registration for an already-running session (extensions only
    * apply at construction time) — the FULL surface, not just the SQL
    * functions: a live session registered here previously never got the
    * large-IN-list rewrite or the as-of strategy, and unlike AsOf.join
    * (which self-heals by appending its strategy) the optimizer rule
    * has no fallback — a 100k-element isin would silently stay a
    * per-row list scan. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graftshim.GraftShim.registerFunction(
      spark, "graft_dot", dotInfo, dotBuilder)
    org.apache.spark.sql.graftshim.GraftShim.registerFunction(
      spark, "graft_stem", stemInfo, stemBuilder)
    org.apache.spark.sql.graftshim.GraftShim.registerFunction(
      spark, "graft_winnow", winnowInfo, winnowBuilder)
    org.apache.spark.sql.graftshim.GraftShim.registerFunction(
      spark, "graft_labels", labelsInfo, labelsBuilder)
    org.apache.spark.sql.graftshim.GraftShim.registerFunction(
      spark, "graft_image_labels", imageLabelsInfo, imageLabelsBuilder)
    org.apache.spark.sql.graftshim.GraftShim.registerFunction(
      spark, "graft_simhash", simhashInfo, simhashBuilder)
    org.apache.spark.sql.graftshim.GraftShim.registerFunction(
      spark, "graft_dom_text", domTextInfo, domTextBuilder)
    org.apache.spark.sql.graftshim.GraftShim.registerFunction(
      spark, "graft_dom_attr", domAttrInfo, domAttrBuilder)
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[graft.plans.LargeInListToJoinRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.LargeInListToJoinRule()
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
  }
}
