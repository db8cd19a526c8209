package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Pipeline

/** Invariants of the composed q_etl_pipeline that its oracle can miss
  * under future edits. The merge stage probes the target anti-join with
  * `updateIds`, a cheap key-arithmetic restatement of the enrichment
  * gates that build `updates` — two code paths that MUST select the
  * same id set. If they drift, an id in updates-but-not-updateIds keeps
  * its target row AND emits update rows (duplicates), and an id in
  * updateIds-but-not-updates vanishes from the output entirely. Both
  * failure modes are visible in the OUTPUT, so these checks survive any
  * internal refactor of the query. */
class PipelineSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {
  lazy val spark = TestSpark.spark

  private lazy val out =
    Pipeline.queries("q_etl_pipeline")(spark, TestSpark.sf).cache()

  // drop the full-result cache (and the pipeline's internal persists)
  // so later suites see a clean cache registry
  override def afterAll(): Unit = TestSpark.housekeeping()

  test("no id carries both a target row and an update row") {
    val twoSrc = out.groupBy(col("id"))
      .agg(countDistinct(col("src")).as("nsrc"))
      .filter(col("nsrc") > 1)
    assert(twoSrc.isEmpty, twoSrc.limit(5).collect().mkString(", "))
  }

  test("every already-stored post ('P' slice) survives the merge") {
    val target = Tables(spark, TestSpark.sf, "orders")
      .filter(col("o_orderstatus") === "P")
      .select(col("o_orderkey").as("id"))
    val lost = target.join(out.select(col("id")).distinct(), Seq("id"), "left_anti")
    assert(lost.isEmpty, lost.limit(5).collect().mkString(", "))
  }
}
