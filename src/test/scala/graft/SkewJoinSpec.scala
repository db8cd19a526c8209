package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling: with one hot key dominating the shuffle, the
  * adaptive planner must split the skewed partition at runtime
  * (AQEShuffleRead "skewed") instead of letting one task run the whole
  * hot key — the join-side complement to the salted AGGREGATION in
  * q_salted_agg. Thresholds are forced low so the 6 MB test shuffle
  * triggers the same decision a multi-TB hot key would. */
class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("AQE splits the skewed partition of a sort-merge join") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "20KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 90% of rows on one hot key; payload pads the partition size
      val facts = spark.range(60000).select(
        when(col("id") % 10 < 9, lit(7L)).otherwise(col("id")).as("k"),
        concat(lit("x"), col("id").cast("string"), lit("y" * 64)).as("pad"))
      val dim = spark.range(60000).select(col("id").as("k"),
        col("id").cast("string").as("v"))
      val j = facts.join(dim, "k")
      // execute THIS dataframe (count() would build a separate plan)
      assert(j.collect().length == 60000)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan.take(500))
      assert(plan.contains("SortMergeJoin(skew=true)"), plan.take(4000))
      assert(plan.contains("AQEShuffleRead skewed"), plan.take(4000))
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
