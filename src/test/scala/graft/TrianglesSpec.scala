package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Analytic

/** Degree-ordered triangle counting: known-structure graphs, agreement
  * with a brute-force enumeration on the real co-occurrence graph, and
  * layout invariance (the orientation is a pure function of the edge
  * SET, so partitioning must not change a single count). */
class TrianglesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    countsDf(edges.toDF("u", "v"))

  private def countsDf(raw: DataFrame): Map[Long, Long] = {
    val m = Analytic.trianglesPerNode(raw)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    TestSpark.housekeeping()
    m
  }

  test("K4: every node sits in C(3,2) = 3 triangles") {
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    assert(counts(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("star hub has no triangles at any degree (the last-reducer shape)") {
    // a 40-spoke hub: naive wedge enumeration at the hub would emit
    // C(40,2) pairs; the oriented form emits none and returns empty
    assert(counts((1L to 40L).map(i => (0L, i))).isEmpty)
  }

  test("one closed wedge: only the three cycle nodes appear") {
    val l = counts(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    assert(l == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("matches brute-force enumeration on the real co-occurrence graph") {
    val li = Tables(spark, TestSpark.sf, "lineitem")
      .filter(col("l_orderkey") % 8 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val raw = li.as("a")
      .join(li.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
      .distinct().persist()
    // brute force: a < b < c in RAW id order needs edges (a,b), (b,c),
    // (a,c) — no degree orientation involved, an independent formulation
    val brute = raw.as("e1")
      .join(raw.as("e2"), col("e1.v") === col("e2.u"))
      .join(raw.as("e3"),
        col("e1.u") === col("e3.u") && col("e2.v") === col("e3.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(brute.nonEmpty, "test graph has no triangles — fixture too small")
    assert(countsDf(raw) == brute)
  }

  test("partitioning-invariant: counts survive an adversarial repartition") {
    val k4 = (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b))
      .toDF("u", "v")
    assert(countsDf(k4.repartition(7)) == countsDf(k4.coalesce(1)))
  }
}
