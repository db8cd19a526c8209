package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native as-of join (graft.plans.AsOfJoin): semantics on hand-built
  * edge cases, invariance to input partitioning (the cluster-portability
  * property), equivalence with the window formulation on real data, and
  * the physical plan shape we depend on at scale — exactly one shuffle
  * per side, merge runs inside AsOfJoinExec with no extra exchanges.
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // left: (key, time, tag) / right: (key, time, payload)
  private def leftDf = Seq(
    ("a", 10L, "a10"), ("a", 20L, "a20"), ("a", 30L, "a30"),
    ("b", 5L, "b5"), ("c", 50L, "c50")
  ).toDF("k", "t", "tag")

  private def rightDf = Seq(
    ("a", 9L, "pay-a9"), ("a", 20L, "pay-a20"), ("a", 25L, "pay-a25"),
    ("b", 6L, "pay-b6"), ("d", 1L, "pay-d1")
  ).toDF("k", "t", "payload")

  private def run(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame): Map[String, String] =
    graft.plans.AsOf.join(l, r, keys = Seq("k"), leftTime = "t", rightTime = "t")
      .select($"tag", $"payload_r")
      .collect().map(row => row.getString(0) -> row.getString(1)).toMap

  test("NULL keys never match — not even another NULL (SQL equi-join semantics)") {
    // a natural ordering compares two null keys EQUAL, so without the
    // explicit guard every null-key right row would be attributed to
    // every null-key left row; SQL joins (and pandas merge_asof) emit
    // nulls for those left rows instead
    val l = Seq((Option("a"), 10L, "a10"), (Option.empty[String], 10L, "lnull"))
      .toDF("k", "t", "tag")
    val r = Seq((Option("a"), 9L, "pay-a9"), (Option.empty[String], 5L, "pay-null"))
      .toDF("k", "t", "payload")
    val got = run(l, r)
    assert(got == Map("a10" -> "pay-a9", "lnull" -> null), got.toString)
    // and forward direction takes the same guard path
    val fwd = graft.plans.AsOf.join(l, r, keys = Seq("k"),
        leftTime = "t", rightTime = "t", direction = "forward")
      .select($"tag", $"payload_r")
      .collect().map(row => row.getString(0) -> row.getString(1)).toMap
    assert(fwd("lnull") == null, fwd.toString)
  }

  test("backward as-of: latest right at-or-before each left row; no match → null") {
    val got = run(leftDf, rightDf)
    assert(got == Map(
      "a10" -> "pay-a9",   // strictly before
      "a20" -> "pay-a20",  // tie at equal time is INCLUSIVE
      "a30" -> "pay-a25",
      "b5" -> null,        // right exists for key but only later (t=6)
      "c50" -> null))      // key absent on the right entirely
  }

  test("null right times are ignored; null left time matches nothing") {
    val l = Seq(("a", Option(10L), "a10"), ("a", Option.empty[Long], "anull"))
      .toDF("k", "t", "tag")
    val r = Seq(("a", Option(5L), "pay-a5"), ("a", Option.empty[Long], "pay-null"))
      .toDF("k", "t", "payload")
    val got = run(l, r)
    assert(got == Map("a10" -> "pay-a5", "anull" -> null))
  }

  test("forward as-of: earliest right at-or-after; peeked rows serve many lefts") {
    val got = graft.plans.AsOf.join(leftDf, rightDf,
        keys = Seq("k"), leftTime = "t", rightTime = "t", direction = "forward")
      .select($"tag", $"payload_r")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map(
      "a10" -> "pay-a20",  // rt=20 is the earliest >= 10
      "a20" -> "pay-a20",  // tie at equal time is INCLUSIVE
      "a30" -> null,       // no right at-or-after 30
      "b5" -> "pay-b6",    // the same b6 row would serve further b lefts
      "c50" -> null))
  }

  test("tolerance bounds the match distance in both directions") {
    val back = graft.plans.AsOf.join(leftDf, rightDf,
        keys = Seq("k"), leftTime = "t", rightTime = "t",
        toleranceUs = Some(1L))
      .select($"tag", $"payload_r")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // a10 matches rt=9 at distance 1 (inclusive); a30's best rt=25 is 5 away
    assert(back == Map("a10" -> "pay-a9", "a20" -> "pay-a20",
      "a30" -> null, "b5" -> null, "c50" -> null))
    val fwd = graft.plans.AsOf.join(leftDf, rightDf,
        keys = Seq("k"), leftTime = "t", rightTime = "t",
        direction = "forward", toleranceUs = Some(1L))
      .select($"tag", $"payload_r")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // a10's earliest following rt=20 is 10 away → out of tolerance
    assert(fwd == Map("a10" -> null, "a20" -> "pay-a20",
      "a30" -> null, "b5" -> "pay-b6", "c50" -> null))
  }

  test("unmatched rows yield null even for non-nullable primitive right columns") {
    // regression: the output projection must bind the right side as
    // nullable, else an unmatched left row reads primitive defaults (0)
    // from the null row instead of null
    val l = Seq(("a", 10L, "a10")).toDF("k", "t", "tag")
    val r = Seq(("a", 99L, 7L)).toDF("k", "t", "num") // only at t=99 > 10
    val row = graft.plans.AsOf.join(l, r,
        keys = Seq("k"), leftTime = "t", rightTime = "t")
      .select($"tag", $"t_r", $"num_r").collect()(0)
    assert(row.getString(0) == "a10")
    assert(row.isNullAt(1) && row.isNullAt(2), row.toString)
  }

  test("result is invariant to input partitioning") {
    val base = run(leftDf, rightDf)
    val repart = run(leftDf.repartition(7, $"tag"), rightDf.repartition(5))
    assert(repart == base)
    val single = run(leftDf.coalesce(1), rightDf.coalesce(1))
    assert(single == base)
  }

  test("native operator matches the window formulation on events data") {
    val native = operators.Extras.queries("q_asof_join_native")(spark, TestSpark.sf)
    val window = operators.Extras.queries("q_asof_join")(spark, TestSpark.sf)
    assert(native.schema.fieldNames.sameElements(window.schema.fieldNames))
    val n = native.collect().map(_.toSeq)
    val w = window.collect().map(_.toSeq)
    assert(n.length == w.length && n.length > 0)
    assert(n.sameElements(w))
  }

  test("plan shape: AsOfJoinExec with exactly one shuffle + sort per side") {
    val df = graft.plans.AsOf.join(
      leftDf, rightDf, keys = Seq("k"), leftTime = "t", rightTime = "t")
    val plan = df.queryExecution.executedPlan.toString
    // nodeName strips the Exec suffix: the physical operator prints "AsOfJoin"
    assert(plan.contains("AsOfJoin ["), plan)
    // one exchange per side — the merge itself introduces none
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
    assert("Sort \\[".r.findAllIn(plan).size == 2, plan)
  }
}
