package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VecSum

/** Custom TypedImperativeAggregate: partial-agg plan shape, exact
  * order-independence (the reproducibility property fixed-point
  * accumulation buys), and kernel semantics. */
class VecSumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df = Seq(
    (0, Seq(0.1, -0.25)), (0, Seq(0.2, 0.75)), (1, Seq(1.0, -1.0))
  ).toDF("g", "v")

  test("elementwise fixed-point sums with half-away-from-zero rounding") {
    val got = df.groupBy($"g")
      .agg(VecSum.vecSumScaled($"v", 2).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(got == Map(0 -> Seq(300000L, 500000L), 1 -> Seq(1000000L, -1000000L)))
    // negative half rounds away from zero (DuckDB ROUND semantics)
    val half = Seq((0, Seq(-0.0000005))).toDF("g", "v")
      .groupBy($"g").agg(VecSum.vecSumScaled($"v", 1).as("s"))
      .collect()(0).getSeq[Long](1)
    assert(half == Seq(-1L))
  }

  test("aggregates with map-side partials (ObjectHashAggregate x2)") {
    val plan = df.groupBy($"g").agg(VecSum.vecSumScaled($"v", 2).as("s"))
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan.take(2000))
  }

  test("result invariant to partitioning (integer sums are associative)") {
    val e = Tables(spark, TestSpark.sf, "embeddings")
      .select($"label", $"embedding".cast("array<double>").as("v"))
    def run(d: org.apache.spark.sql.DataFrame) = d.groupBy($"label")
      .agg(VecSum.vecSumScaled($"v", 64).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(run(e) == run(e.repartition(13)))
    assert(run(e) == run(e.coalesce(1)))
  }
}
