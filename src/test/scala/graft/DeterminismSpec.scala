package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Relational, Analytic}

/** The 100-TB property that matters most: results must not depend on
  * partitioning. Money math is exact DECIMAL and similarity math is
  * fixed-order DOUBLE precisely so that a 3-partition laptop run and a
  * 3000-partition cluster run hash identically. Asserted here by
  * executing the same queries under different shuffle partitioning. */
class DeterminismSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def runWith(parts: String, name: String): Set[Seq[Any]] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try {
      val q = Relational.queries.get(name).orElse(Analytic.queries.get(name)).get
      q(spark, TestSpark.sf).collect().map(_.toSeq).toSet
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  Seq("q1_agg", "q_inner_enrich", "q_stats_exact", "q_salted_agg").foreach { name =>
    test(s"$name is identical under 3 vs 17 shuffle partitions") {
      assert(runWith("3", name) == runWith("17", name))
    }
  }
}
