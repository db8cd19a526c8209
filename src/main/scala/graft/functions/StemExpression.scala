package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Porter stemming as a native Catalyst expression (`graft_stem`).
  *
  * The stemmer kernel is [[PorterStemmer.stem]]; this node exposes it to
  * the planner as a first-class expression instead of a Scala UDF. The
  * difference at scale: a UDF forces a codegen boundary (the projection
  * splits, rows round-trip through the UDF's anonymous class and a
  * null-check wrapper), while this expression stays inside whole-stage
  * codegen — the generated code calls the static kernel directly, so a
  * tokenize→stem→count pipeline compiles to ONE fused stage.
  */
case class Stem(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_stem expects a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_stem"

  override def nullSafeEval(v: Any): Any =
    PorterStemmer.stemUTF8(v.asInstanceOf[UTF8String])

  // Scala objects emit static forwarders, so the generated Java can call
  // the kernel without holding a reference to the expression instance.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PorterStemmer.stemUTF8($c)")

  override protected def withNewChildInternal(newChild: Expression): Stem =
    copy(child = newChild)
}

object StemExpression {
  import org.apache.spark.sql.graftshim.GraftShim

  /** stem(word) over a string column, codegen'd. */
  def stem(c: Column): Column =
    GraftShim.column(Stem(GraftShim.expression(c)))
}
