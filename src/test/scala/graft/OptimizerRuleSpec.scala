package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.LargeInListToJoinRule

class OptimizerRuleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withRule[A](f: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ LargeInListToJoinRule(threshold = 64)
    try f finally spark.experimental.extraOptimizations = prev
  }

  test("large IN list rewrites to a semi join with identical results") {
    val keys = (0L until 200L).filter(_ % 3 == 0)
    val df = Tables(spark, TestSpark.sf, "orders")
    val baseline = df.filter(col("o_orderkey").isin(keys: _*))
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    withRule {
      val q = df.filter(col("o_orderkey").isin(keys: _*)).select("o_orderkey")
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("Join LeftSemi"), optimized.take(1500))
      assert(q.collect().map(_.getLong(0)).sorted.toSeq == baseline)
    }
  }

  test("large NOT IN list rewrites to an anti join with identical results") {
    val keys = (0L until 100L)
    val df = Tables(spark, TestSpark.sf, "orders")
    val baseline = df.filter(!col("o_orderkey").isin(keys: _*))
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    withRule {
      val q = df.filter(!col("o_orderkey").isin(keys: _*)).select("o_orderkey")
      assert(q.queryExecution.optimizedPlan.toString.contains("Join LeftAnti"))
      assert(q.collect().map(_.getLong(0)).sorted.toSeq == baseline)
    }
  }

  test("small IN lists are left untouched") {
    withRule {
      val q = Tables(spark, TestSpark.sf, "orders")
        .filter(col("o_orderkey").isin(1L, 2L, 3L))
      assert(!q.queryExecution.optimizedPlan.toString.contains("Join LeftSemi"))
    }
  }
}
