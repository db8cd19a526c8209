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

  private def literalRelation(attr: Attribute, list: Seq[Expression]): LocalRelation = {
    val out = AttributeReference("graft_in_value", attr.dataType, nullable = false)()
    val rows = list.map { case Literal(v, _) => InternalRow(v) }
    LocalRelation(Seq(out), rows)
  }

  // Catalyst's OptimizeIn turns big literal lists into InSet before this
  // rule runs (extraOptimizations/injected rules are late), so match both.
  private def setEligible(attr: Attribute, hset: Set[Any]): Boolean =
    hset.size >= threshold && !hset.contains(null)

  private def setRelation(attr: Attribute, hset: Set[Any]): LocalRelation = {
    val out = AttributeReference("graft_in_value", attr.dataType, nullable = false)()
    LocalRelation(Seq(out), hset.toSeq.map(InternalRow(_)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Filter(In(attr: Attribute, list), child) if eligible(attr, list) =>
      val rel = literalRelation(attr, list)
      Join(child, rel, LeftSemi,
        Some(EqualTo(attr, rel.output.head)), JoinHint.NONE)
    case Filter(Not(In(attr: Attribute, list)), child) if eligible(attr, list) =>
      val rel = literalRelation(attr, list)
      Join(Filter(IsNotNull(attr), child), rel, LeftAnti,
        Some(EqualTo(attr, rel.output.head)), JoinHint.NONE)
    case Filter(InSet(attr: Attribute, hset), child) if setEligible(attr, hset) =>
      val rel = setRelation(attr, hset)
      Join(child, rel, LeftSemi,
        Some(EqualTo(attr, rel.output.head)), JoinHint.NONE)
    case Filter(Not(InSet(attr: Attribute, hset)), child) if setEligible(attr, hset) =>
      val rel = setRelation(attr, hset)
      Join(Filter(IsNotNull(attr), child), rel, LeftAnti,
        Some(EqualTo(attr, rel.output.head)), JoinHint.NONE)
  }
}
