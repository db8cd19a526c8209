package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Star-contraction connected components: correctness on graphs with
  * known components, agreement with the label-propagation operator on
  * real pair data, and the property that justifies shipping a second
  * CC strategy at all — alternation count stays logarithmic on a path
  * graph whose RADIUS (= label propagation's round count) is linear. */
class CCStarsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def labelsOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.ccStars(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("stars: known component structure (two components + isolated-free)") {
    // component {1,2,3,5} (min 1) and {10,11} (min 10); node 7 absent
    // from the edge list so absent from the output (same contract as
    // the propagation loop / the recursive-CTE oracle)
    val l = labelsOf(Seq((2L, 1L), (3L, 2L), (5L, 3L), (10L, 11L)))
    assert(l == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("stars: empty edge set returns an empty labeling") {
    assert(labelsOf(Seq.empty).isEmpty)
  }

  test("stars: self-loops and duplicate edges are harmless") {
    val l = labelsOf(Seq((4L, 4L), (4L, 9L), (9L, 4L), (4L, 9L)))
    assert(l == Map(4L -> 4L, 9L -> 4L))
  }

  test("stars agree with label propagation on the real near-dup pairs") {
    val stars = Dedup.queries("q_cc_stars")(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSeq
    val prop = Dedup.queries("q_dedup_clusters")(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSeq
    assert(stars.nonEmpty)
    assert(stars == prop)
  }

  test("hybrid cluster formation escapes to stars on a chain deeper than its round cap") {
    // a 64-node chain with maxRounds=10: propagation alone reaches
    // only 10 hops from the minimum, so a correct full labeling PROVES
    // the diameter escape hatch handed the graph to star contraction —
    // the default operator can no longer be diameter-killed
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val l = Dedup.clustersHybrid(chain, maxRounds = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l == (0L to 63L).map(_ -> 0L).toMap)
    // and the fast path still serves the common star shape unchanged
    val star = Seq((7L, 3L), (9L, 3L), (12L, 3L)).toDF("id_a", "id_b")
    val ls = Dedup.clustersHybrid(star, maxRounds = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ls == Map(3L -> 3L, 7L -> 3L, 9L -> 3L, 12L -> 3L))
  }

  test("alternation count is logarithmic on a linear-radius path graph") {
    // a 64-node chain: radius from the minimum id is 63, so label
    // propagation needs 63 rounds; star contraction halves tree
    // heights per alternation and must land well under that. The
    // bound asserted (12) is 2·log2(64) — loose enough to be stable,
    // tight enough that a contraction regressed to one-hop-per-round
    // (>= 63 rounds, i.e. the 30-round backstop) can never pass.
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds) = Dedup.ccStarsWithRounds(chain)
    val l = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l == (0L to 63L).map(_ -> 0L).toMap)
    assert(rounds <= 12, s"expected O(log n) alternations on a 64-chain, got $rounds")
  }
}
