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

  test("simhash pigeonhole join: a boilerplate-heavy block key is an AQE skew split, not a plan change") {
    // The q_simhash_hamming comment asserts this (VERDICT r10 item 7);
    // here it runs on the REAL join layout (Dedup.simhashPairsFrom):
    // 90% of a 4k-doc fingerprint frame shares one TOP 8-bit block —
    // the boilerplate-header shape — while scattering in the low 24
    // bits, so ONE (blk=0, bits) join key carries ~3.6k candidate rows
    // and the other block keys stay thin. With production-shaped
    // thresholds scaled to the test shuffle, AQE must split that
    // partition at runtime; the plan stays the same block-keyed
    // sort-merge join (no cartesian, no nested loop). A planted
    // near-dup cluster inside the hot block keeps the OUTPUT
    // non-vacuous: real pairs survive the Hamming filter.
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
      // hot block: top byte 0xAB; low 24 bits scattered (no real
      // near-dups) except a 50-doc cluster at 4 adjacent values
      val fp = spark.range(4000).select(col("id").as("doc_id"),
        when(col("id") < 50, lit(0xAB000000L) + (col("id") % 4))
          .when(col("id") % 10 < 9,
            lit(0xAB000000L) + (col("id") * 7919L) % 16777216L)
          .otherwise((col("id") * 104729L) % 4294967296L).as("f"))
      val j = graft.operators.Dedup.simhashPairsFrom(fp)
      val rows = j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan.take(500))
      assert(plan.contains("SortMergeJoin(skew=true)"), plan.take(4000))
      assert(plan.contains("AQEShuffleRead skewed"), plan.take(4000))
      assert(!plan.contains("CartesianProduct"), plan.take(4000))
      assert(!plan.contains("BroadcastNestedLoop"), plan.take(4000))
      // the split changed the schedule, not the answer: the planted
      // cluster's pairs survive (hamming(f_a, f_b) ≤ 3 within the 4
      // adjacent values) and every emitted pair is a true positive
      assert(rows.nonEmpty, "planted near-dup cluster produced no pairs")
      rows.foreach { r =>
        assert(r.getLong(2) >= 0 && r.getLong(2) <= 3, r.toString)
      }
      val clusterPairs = rows.count(r =>
        r.getLong(0) < 50 && r.getLong(1) < 50)
      assert(clusterPairs > 0, "hot-block cluster pairs missing")
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
