package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Sketch-based approximations vs their exact forms (the scale path for
  * distinct counts and quantiles; engines implement different sketches,
  * so these are invariant-tested rather than oracle-compared). */
class ApproxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("approx_count_distinct within 5% of exact") {
    val df = Tables(spark, TestSpark.sf, "events")
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id")).as("approx"))
      .collect()(0)
    val exact = df.getLong(0).toDouble
    val approx = df.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact <= 0.05, s"exact=$exact approx=$approx")
  }

  test("approx_percentile brackets the exact median") {
    val r = Tables(spark, TestSpark.sf, "events")
      .agg(expr("percentile(value, 0.5)").as("exact"),
        expr("approx_percentile(value, 0.5, 1000)").as("approx"))
      .collect()(0)
    val exact = r.getDouble(0); val approx = r.getDouble(1)
    assert(math.abs(approx - exact) <= 0.05 * math.max(1.0, exact.abs),
      s"exact=$exact approx=$approx")
  }
}
