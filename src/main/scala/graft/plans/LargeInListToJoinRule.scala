package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression, In, InSet, IsNotNull, Literal, Not}
import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.AttributeReference

/** Optimizer rule (SURVEY.md §4's optional demo, made real): a Filter
  * with a very large literal IN-list evaluates the list per row; past a
  * threshold a (broadcast) semi-join against a literal relation is both
  * faster and lets the join machinery (broadcast, AQE) take over — the
  * reference's 49-name blocklist filter (F1/J7) at "what if the
  * blocklist is 100k rows" scale.
  *
  * Conservative by design: only fires on non-null literal lists over a
  * bare attribute (null-semantics of IN and NOT IN with NULLs differ
  * from joins, so those cases are left untouched).
  */
case class LargeInListToJoinRule(threshold: Int = 64) extends Rule[LogicalPlan] {

  // Null semantics: with an all-non-null literal list, `x IN (...)` is
  // exactly a semi join even for nullable x (NULL never matches). For
  // `x NOT IN (...)` a NULL x yields NULL → row dropped by the Filter,
  // so the anti-join rewrite adds an IsNotNull(x) guard.
  private def eligible(attr: Attribute, list: Seq[Expression]): Boolean =
    list.length >= threshold &&
      list.forall {
        case Literal(v, dt) => v != null && dt == attr.dataType
        case _ => false
      }

  // Catalyst's OptimizeIn turns big literal lists into InSet before this
  // rule runs (extraOptimizations/injected rules are late), so match
  // both. InSet values carry no per-value dataType to re-check: they are
  // already the attribute's internal representation (the analyzer
  // type-checked the In they came from), so null-freedom is the only
  // remaining guard.
  private def setEligible(hset: Set[Any]): Boolean =
    hset.size >= threshold && !hset.contains(null)

  /** The one rewrite both list shapes and both polarities share: a
    * LocalRelation of the literal values, semi-joined (IN) or — with
    * the IsNotNull guard restoring NOT-IN's NULL-drop — anti-joined. */
  private def rewrite(attr: Attribute, values: Seq[Any], negated: Boolean,
      child: LogicalPlan): Join = {
    val out = AttributeReference("graft_in_value", attr.dataType, nullable = false)()
    val rel = LocalRelation(Seq(out), values.map(InternalRow(_)))
    if (negated)
      Join(Filter(IsNotNull(attr), child), rel, LeftAnti,
        Some(EqualTo(attr, out)), JoinHint.NONE)
    else
      Join(child, rel, LeftSemi, Some(EqualTo(attr, out)), JoinHint.NONE)
  }

  private def values(list: Seq[Expression]): Seq[Any] =
    list.map { case Literal(v, _) => v }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Filter(In(attr: Attribute, list), child) if eligible(attr, list) =>
      rewrite(attr, values(list), negated = false, child)
    case Filter(Not(In(attr: Attribute, list)), child) if eligible(attr, list) =>
      rewrite(attr, values(list), negated = true, child)
    case Filter(InSet(attr: Attribute, hset), child) if setEligible(hset) =>
      rewrite(attr, hset.toSeq, negated = false, child)
    case Filter(Not(InSet(attr: Attribute, hset)), child) if setEligible(hset) =>
      rewrite(attr, hset.toSeq, negated = true, child)
  }
}
