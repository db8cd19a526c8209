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

  test("q_assortativity: bounded correlation, brute-force agreement") {
    val rows = graft.operators.Analytic
      .queries("q_assortativity")(spark, TestSpark.sf).collect()
    TestSpark.housekeeping()
    assert(rows.length == 1)
    val r = rows.head.getDouble(1)
    assert(math.abs(r) <= 1.0 + 1e-9)
    // independent recompute from the same 8x-thinned co-occurrence
    // edges, plain double Pearson on symmetrized endpoint degrees
    import org.apache.spark.sql.functions.{col => C}
    val li = Tables(spark, TestSpark.sf, "lineitem")
      .filter(C("l_orderkey") % 8 === 0)
      .select(C("l_orderkey"), C("l_partkey")).distinct()
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    TestSpark.housekeeping()
    val edges = (for {
      (o1, p1) <- li; (o2, p2) <- li
      if o1 == o2 && p1 < p2
    } yield (p1, p2)).distinct
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val sym = edges ++ edges.map(e => (e._2, e._1))
    val xs = sym.map(e => deg(e._1)); val ys = sym.map(e => deg(e._2))
    val n = sym.length.toLong
    val sx = xs.sum; val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(x => x * x).sum
    val expect = BigDecimal((n * sxy - sx * sx).toDouble /
      (n * sxx - sx * sx).toDouble)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r == expect, s"$r vs $expect")
    assert(rows.head.getLong(0) == n)
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

  test("q_good_turing: count ordering, mass identity, smoothed r*") {
    val rows = graft.operators.TextAnalytics
      .queries("q_good_turing")(spark, TestSpark.sf).collect()
    TestSpark.housekeeping()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tokens, types, hapax, dis) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(hapax <= types && types <= tokens, r.toString)
      assert(dis <= types - hapax, "doubletons are non-hapax types")
      val pUnseen = r.getDouble(5)
      // p_unseen + coverage must reconstruct 1 (same rounding scale)
      assert(math.abs(pUnseen + r.getDouble(7) - 1.0) < 2e-9)
      assert(pUnseen >= 0.0 && pUnseen <= 1.0)
      // Good–Turing smoothed count for r=1 recomputed in memory
      if (hapax > 0) {
        val expect = BigDecimal(2.0 * dis / hapax)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getDouble(6) == expect)
        // simple GT discounts the hapax count: r* below the raw 2·N₂
        // bound and, on any Zipfian corpus, below r+1 = 2
        assert(r.getDouble(6) <= 2.0 * dis)
      } else assert(r.isNullAt(6))
    }
  }

  test("q_negative_sampling equals the brute interval-table recompute") {
    // rebuild the whole sampler in memory: word counts from a plain
    // split, JVM pow/md5, sequential interval assignment
    val docs = graft.Tables(spark, TestSpark.sf, "documents")
      .select("text").collect().map(_.getString(0))
    TestSpark.housekeeping()
    val freq = docs.flatMap(_.toLowerCase.split(" ", -1))
      .filter(_.nonEmpty).groupBy(identity)
      .map { case (w, xs) => (w, xs.length.toLong) }
    val ordered = freq.toSeq.sortBy { case (w, f) => (-f, w) }
    val wi = ordered.map { case (w, f) =>
      (w, f, math.round(math.pow(f.toDouble, 0.75) * 1000)) }
    val wsum = wi.map(_._3).sum
    val intervals = wi.scanLeft(("", 0L, 0L, 0L)) {
      case ((_, _, _, hi), (w, f, x)) => (w, f, hi, hi + x)
    }.drop(1) // (word, freq, lo, hi)
    val md = java.security.MessageDigest.getInstance("MD5")
    def pick(t: Long) = intervals.find(i => t >= i._3 && t < i._4).get
    val expect = ordered.take(20).map(_._1).flatMap { c =>
      (1L to 5L).map { j =>
        val hex = md.digest(s"$c#$j"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .map(b => f"$b%02x").mkString.take(5)
        val t = java.lang.Long.parseLong(hex, 16) * wsum / 1048576L
        val p = pick(t)
        (c, j, p._1, p._2, p._1 == c)
      }
    }.sortBy { case (c, j, _, _, _) => (c, j) }
    val rows =
      try graft.operators.TextAnalytics.queries("q_negative_sampling")(
        spark, TestSpark.sf).collect()
      finally TestSpark.housekeeping()
    assert(rows.length == 100, "every probe hits exactly one interval")
    val got = rows.map(r => (r.getString(0), r.getLong(1), r.getString(2),
      r.getLong(3), r.getBoolean(4))).toSeq
    assert(got == expect)
    // the draw follows the tilted unigram: heavier words dominate but
    // don't monopolize (a degenerate table would emit one word)
    assert(got.map(_._3).distinct.size > 5)
  }

  test("q_simpson_diversity: brute lambda, Hill-number bounds") {
    val raw = graft.Tables(spark, TestSpark.sf, "documents")
      .select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    TestSpark.housekeeping()
    val rows = graft.operators.TextAnalytics
      .queries("q_simpson_diversity")(spark, TestSpark.sf).collect()
    TestSpark.housekeeping()
    assert(rows.map(_.getString(0)).toSet == raw.map(_._1).toSet)
    rows.foreach { r =>
      val g = raw.filter(_._1 == r.getString(0)).map(_._2)
      val ni = g.groupBy(identity).map(_._2.length.toLong)
      val (n, ssq) = (g.length.toLong, ni.map(x => x * x).sum)
      assert(r.getLong(1) == n && r.getLong(2) == ni.size.toLong)
      assert(r.getDouble(3) == BigDecimal(ssq.toDouble / (n * n))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
      // 1 <= effective languages <= observed languages
      assert(r.getDouble(4) >= 1.0 - 1e-9)
      assert(r.getDouble(4) <= ni.size.toDouble + 1e-9)
    }
  }

  test("q_entropy_gate: brute per-doc Shannon H, max-entropy bound") {
    val docs = graft.Tables(spark, TestSpark.sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    TestSpark.housekeeping()
    val rows = graft.operators.TextAnalytics
      .queries("q_entropy_gate")(spark, TestSpark.sf).collect()
    TestSpark.housekeeping()
    assert(rows.length == docs.length)
    val byId = docs.toMap
    rows.foreach { r =>
      val cs = byId(r.getLong(0)).toSeq.groupBy(identity)
        .map(_._2.length.toLong)
      val n = cs.sum
      assert(r.getLong(1) == n && r.getLong(2) == cs.size.toLong)
      var slog = BigDecimal(0)
      cs.foreach { c =>
        slog += BigDecimal(c.toDouble * math.log(c.toDouble))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }
      val h = BigDecimal(math.log(n.toDouble) - slog.toDouble / n)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == h, s"doc ${r.getLong(0)}")
      // 0 <= H <= ln(alphabet size), and the flag restates the cut
      assert(h >= -1e-9 && h <= math.log(cs.size.toDouble) + 1e-9)
      assert(r.getBoolean(4) == (h < 2.5))
    }
  }
}
