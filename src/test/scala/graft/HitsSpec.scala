package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural gates for HITS that the value oracle can't state: the
  * mutual-reinforcement ranking on a graph with KNOWN structure, and
  * the normalization invariants on the real testdata graph.
  */
class HitsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("q_hits: known star structure ranks as Kleinberg says") {
    import spark.implicits._
    // customers 1..4 each buy from supplier 10 (orders 1..4); customer
    // 1 additionally buys from supplier 11 (order 5). s10 is the
    // consensus authority; c1 the best hub (buys from both suppliers).
    val dir = java.nio.file.Files.createTempDirectory("graft-hits")
      .toFile.getAbsolutePath
    Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 1L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L), (5L, 11L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows =
      try graft.operators.Analytic.queries("q_hits")(spark, dir).collect()
      finally TestSpark.housekeeping()
    val auth = rows.filter(_.getString(1) == "authority")
      .sortBy(-_.getDouble(2))
    val hubs = rows.filter(_.getString(1) == "hub").sortBy(-_.getDouble(2))
    assert(auth.head.getString(0) == "s10" && auth.head.getDouble(2) == 1.0)
    assert(auth.last.getString(0) == "s11" &&
      auth.last.getDouble(2) < auth.head.getDouble(2))
    assert(hubs.head.getString(0) == "c1" && hubs.head.getDouble(2) == 1.0)
    // c2..c4 are symmetric: identical hub scores, all below c1
    val rest = hubs.tail
    assert(rest.map(_.getDouble(2)).distinct.length == 1)
    assert(rest.head.getDouble(2) < 1.0)
  }

  test("q_hits: normalization and shape invariants on testdata") {
    val rows =
      try graft.operators.Analytic.queries("q_hits")(spark, TestSpark.sf)
        .collect()
      finally TestSpark.housekeeping()
    val byKind = rows.groupBy(_.getString(1))
    assert(byKind.keySet == Set("authority", "hub"))
    byKind.foreach { case (kind, g) =>
      // top-15 caps, but a side smaller than 15 returns whole-side
      // (sf0.001 has 10 suppliers)
      assert(g.length <= 15 && g.nonEmpty, kind)
      // max-normalization: the top node scores exactly 1.0, everything
      // is in (0, 1]
      assert(g.map(_.getDouble(2)).max == 1.0, kind)
      g.foreach(r => assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0))
      // node prefixes match the bipartite sides
      val prefix = if (kind == "authority") "s" else "c"
      g.foreach(r => assert(r.getString(0).startsWith(prefix)))
    }
  }
}
