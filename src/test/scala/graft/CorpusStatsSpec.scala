package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gates for the corpus-law and graph-structure statistics: exact
  * ratio restatements, monotone growth curves, and the fitted
  * exponents landing where their definitions force them.
  */
class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("q_clustering_coeff: bounded ratio exactly restating the counts") {
    val rows = graft.operators.Analytic
      .queries("q_clustering_coeff")(spark, TestSpark.sf).collect()
    TestSpark.housekeeping()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (deg, tri, c) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(deg >= 2)
      assert(tri <= deg * (deg - 1) / 2, "triangles exceed wedge capacity")
      val expect = BigDecimal(2.0 * tri.toDouble / (deg * (deg - 1)).toDouble)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(c == expect)
      assert(c >= 0.0 && c <= 1.0)
    }
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(3) >= b.getDouble(3))
      case _ =>
    }
    // the co-purchase graph is clique-heavy by construction (orders
    // are cliques): some node must close real triangles
    assert(rows.head.getDouble(3) > 0.0)
  }

  test("q_heaps_law: monotone growth, full coverage, sublinear beta") {
    val rows = graft.operators.TextAnalytics
      .queries("q_heaps_law")(spark, TestSpark.sf).collect()
      .sortBy(_.getLong(0))
    assert(rows.length == 20)
    val beta = rows.head.getDouble(5)
    assert(rows.forall(_.getDouble(5) == beta))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(2) <= b.getLong(2), "docs must accumulate")
        assert(a.getLong(3) <= b.getLong(3), "tokens must accumulate")
        assert(a.getLong(4) <= b.getLong(4), "vocab can only grow")
      case _ =>
    }
    val nDocs = Tables(spark, TestSpark.sf, "documents").count()
    TestSpark.housekeeping()
    assert(rows.last.getLong(2) == nDocs, "checkpoint 20 must cover all")
    // a finite-vocabulary word soup saturates fast: beta far below 1;
    // at the smallest SF the whole vocabulary fits in checkpoint 1 and
    // the slope is exactly 0 — positive only if vocab actually grew
    assert(beta >= 0.0 && beta < 1.0, s"beta=$beta")
    if (rows.last.getLong(4) > rows.head.getLong(4))
      assert(beta > 0.0, s"vocab grew but beta=$beta")
  }

  test("q_zipf: dense ranks, monotone frequency, negative slope") {
    val rows = graft.operators.TextAnalytics
      .queries("q_zipf")(spark, TestSpark.sf).collect()
      .sortBy(_.getLong(0))
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length))
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) >= b.getLong(2))
      case _ =>
    }
    val slope = rows.head.getDouble(3)
    assert(rows.forall(_.getDouble(3) == slope))
    assert(slope < 0.0, "rank-frequency slope must be negative")
    TestSpark.housekeeping()
  }
}
