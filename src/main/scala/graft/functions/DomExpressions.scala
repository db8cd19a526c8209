package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL-surface forms of the DOM engine (SURVEY S6), so
  * `spark.sql("SELECT graft_dom_text(html, '.news--box')")` works in
  * any graft-extended session next to graft_dot/graft_stem.
  * CodegenFallback deliberately: extraction is an ingest-side per-row
  * map, never a hot codegen span — the value of the Expression form is
  * the SQL registration and null handling, not generated code.
  * ImplicitCastInputTypes (not a hand-rolled type check): NULL literals
  * and castable types coerce like any builtin string function instead
  * of failing analysis with NullType != StringType. */
case class DomText(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes
    with CodegenFallback {
  override def inputTypes: Seq[DataType] =
    Seq(StringType, StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_dom_text"
  override def nullSafeEval(html: Any, sel: Any): Any = {
    val texts = HtmlDom.selectTexts(html.toString, sel.toString)
    new GenericArrayData(texts.map(UTF8String.fromString).toArray[Any])
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DomText =
    copy(left = newLeft, right = newRight)
}

/** `graft_dom_attr(html, selector, attr)` — attribute of every match
  * (null element where a match lacks it); `data-*` names cover the
  * reference's dataset reads. */
case class DomAttr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes
    with CodegenFallback {
  override def inputTypes: Seq[DataType] =
    Seq(StringType, StringType, StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_dom_attr"
  override def nullSafeEval(html: Any, sel: Any, attr: Any): Any = {
    val attrs = HtmlDom.selectAttrs(html.toString, sel.toString, attr.toString)
    new GenericArrayData(
      attrs.map(v => if (v == null) null else UTF8String.fromString(v))
        .toArray[Any])
  }
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): DomAttr =
    copy(first = newFirst, second = newSecond, third = newThird)
}
