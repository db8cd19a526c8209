package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.MisraGries

/** The Misra–Gries guarantees hold for EVERY item, under EVERY
  * partitioning (merge tree) tried — not just the two hot items the
  * oracle-gated query emits: estimates never exceed truth, the
  * underestimate is bounded by N/(k+1), every item heavier than
  * N/(k+1) is present, and the summary never exceeds k counters. */
class MisraGriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 8

  /** Skewed stream: items "h0","h1" ~25% each, "m0".."m15" split ~25%,
    * unique cold items for the rest — hundreds of distinct values, so
    * a k=8 summary prunes constantly. */
  private def stream(n: Int) = (0 until n).map { i =>
    if (i % 4 < 2) s"h${i % 2}"
    else if (i % 4 == 2) s"m${i % 16}"
    else s"c$i"
  }

  private def invariantsHold(n: Int, parts: Int): Unit = {
    val items = stream(n)
    val exact = items.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val df = items.toDF("item").repartition(parts)
    val row = df.agg(MisraGries.mgTopK(col("item"), K).as("sk")).collect()(0)
    val sk = row.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bound = n.toDouble / (K + 1)
    assert(sk.size <= K, s"summary has ${sk.size} counters > k=$K")
    sk.foreach { case (w, est) =>
      val t = exact.getOrElse(w, 0L)
      assert(est <= t, s"$w: est $est exceeds true count $t")
      assert(t - est <= bound, s"$w: underestimate ${t - est} > N/(k+1)=$bound")
    }
    exact.foreach { case (w, t) =>
      if (t > bound)
        assert(sk.contains(w), s"heavy hitter $w (count $t > $bound) missing")
    }
  }

  test("guarantees hold across partitionings (merge-order variation)") {
    for (parts <- Seq(1, 3, 7, 32)) invariantsHold(4000, parts)
  }

  test("guarantees hold on a tiny stream and an all-distinct stream") {
    invariantsHold(10, 2)
    // all-distinct: nothing is guaranteed present, but size/underflow
    // invariants still apply
    val df = (0 until 500).map(i => s"u$i").toDF("item").repartition(5)
    val row = df.agg(MisraGries.mgTopK(col("item"), K).as("sk")).collect()(0)
    val sk = row.getSeq[org.apache.spark.sql.Row](0)
    assert(sk.size <= K)
    sk.foreach(r => assert(r.getLong(1) <= 1L))
  }

  test("nulls are skipped, not counted") {
    val df = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("item")
    val row = df.agg(MisraGries.mgTopK(col("item"), K).as("sk")).collect()(0)
    val sk = row.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sk == Map("a" -> 2L, "b" -> 1L))
  }
}
