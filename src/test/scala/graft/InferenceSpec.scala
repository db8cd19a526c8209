package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the inference pack the value-equality oracle can't
  * state: the KM curve's shape laws (monotone, proper risk-set
  * accounting, product-limit agreement with an independent recompute)
  * and the bootstrap's distributional sanity (replicate spread exists,
  * weights concentrate at Poisson(1) mass, interval brackets the
  * point estimate and is the stated order statistic).
  */
class InferenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    try graft.operators.Inference.queries(name)(spark, TestSpark.sf).collect()
    finally TestSpark.housekeeping()

  test("q_kaplan_meier: monotone curve, exact risk accounting, both fates") {
    val rows = run("q_kaplan_meier").sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    val nTotal = rows.map(r => r.getLong(2) + r.getLong(3)).sum
    assert(rows.head.getLong(1) == nTotal,
      "first risk set must be the whole cohort")
    // risk sets shrink by exactly the subjects leaving at each level
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(1) ==
          a.getLong(1) - a.getLong(2) - a.getLong(3))
        assert(b.getDouble(4) <= a.getDouble(4) + 1e-12,
          "survival must be non-increasing")
      case _ =>
    }
    // independent product-limit recompute (plain double product)
    var s = 1.0
    rows.foreach { r =>
      val (n, d) = (r.getLong(1), r.getLong(2))
      s *= (n - d).toDouble / n.toDouble
      assert(math.abs(r.getDouble(4) - s) < 1e-4,
        s"dur ${r.getLong(0)}: ${r.getDouble(4)} vs $s")
    }
    // the estimator must be non-degenerate on testdata: deaths AND
    // censoring both present, and the curve actually descends
    assert(rows.map(_.getLong(2)).sum > 0 && rows.map(_.getLong(3)).sum > 0)
    // (most sessions are single-event, so the curve drops hard at
    // dur=0 already — gate on strict descent, not a high start)
    assert(rows.head.getDouble(4) > 0.0 && rows.head.getDouble(4) < 1.0)
    assert(rows.last.getDouble(4) < rows.head.getDouble(4))
  }

  test("q_bootstrap_ci: replicate grid, order-stat interval, CI brackets") {
    val rows = run("q_bootstrap_ci").sortBy(_.getLong(0))
    assert(rows.length == 32)
    val ests = rows.map(_.getDouble(2))
    assert(ests.distinct.length > 1, "replicates must actually vary")
    val sortedE = ests.sorted
    val (lo, hi) = (rows.head.getDouble(4), rows.head.getDouble(5))
    assert(rows.forall(r => r.getDouble(4) == lo && r.getDouble(5) == hi))
    assert(lo == sortedE(1) && hi == sortedE(30),
      "CI must be the 2nd/31st order statistic")
    val full = rows.head.getDouble(3)
    assert(lo <= full && full <= hi,
      s"point estimate $full outside [$lo, $hi]")
    // Poisson(1) weight sums concentrate around the sample size:
    // every replicate's w_total within 5 sigma of every other's
    val ws = rows.map(_.getLong(1))
    val mean = ws.sum.toDouble / ws.length
    ws.foreach(w => assert(math.abs(w - mean) < 5 * math.sqrt(mean) + 10))
  }

  test("q_power_analysis: quadratic MDE scaling, consistent moments") {
    val rows = run("q_power_analysis").sortBy(_.getDouble(0))
    assert(rows.map(_.getDouble(0)).toSeq == Seq(0.01, 0.02, 0.05))
    val byMde = rows.map(r => r.getDouble(0) -> r.getLong(4)).toMap
    // n scales as 1/delta^2: halving the MDE quadruples the sample
    assert(math.abs(byMde(0.01) - 4L * byMde(0.02)) <= 8,
      byMde.toString)
    assert(byMde(0.02) > byMde(0.05))
    rows.foreach { r =>
      assert(r.getDouble(2) > 0 && r.getDouble(3) > 0 && r.getLong(4) > 0)
    }
    // the shared moment row is identical across the sweep
    assert(rows.map(_.getDouble(3)).distinct.length == 1)
  }

  test("q_cuped: rho2 bounded, reduction restates it, users counted") {
    val rows = run("q_cuped")
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) > 0)
    val rho2 = r.getDouble(2)
    assert(rho2 >= 0.0 && rho2 <= 1.0, s"rho2=$rho2")
    assert(math.abs(r.getDouble(3) - 100.0 * rho2) < 5e-3,
      "reduction% must restate rho2")
    // pre/post spend of independent uniform purchases is near-
    // uncorrelated: theta finite, rho2 far from 1 (a rho2 near 1
    // would mean the halves leaked into each other)
    assert(rho2 < 0.9)
    assert(!r.getDouble(1).isNaN && !r.getDouble(1).isInfinite)
  }

  test("q_permutation_test: p-value restates the exceedance count") {
    val rows = run("q_permutation_test").sortBy(_.getLong(0))
    assert(rows.length == 64)
    assert(rows.map(_.getLong(0)).toSeq == (0L until 64L))
    val obs = rows.head.getDouble(4)
    val pv = rows.head.getDouble(5)
    assert(rows.forall(r =>
      r.getDouble(4) == obs && r.getDouble(5) == pv))
    val nExceed = rows.count(_.getBoolean(3))
    rows.foreach(r => assert(r.getBoolean(3) ==
      (math.abs(r.getDouble(2)) >= math.abs(obs))))
    assert(pv == BigDecimal((nExceed + 1).toDouble / 65.0)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(pv > 0.0 && pv <= 1.0)
    // random relabelings must vary, and cohort sizes stay near half
    assert(rows.map(_.getDouble(2)).distinct.length > 1)
    val nas = rows.map(_.getLong(1))
    val half = nas.sum.toDouble / nas.length
    nas.foreach(na => assert(math.abs(na - half) < 5 * math.sqrt(half) + 10))
  }

  test("q_bt_strength equals a plain-Scala two-round MM recompute; strengths track evidence") {
    import org.apache.spark.sql.functions._
    // independent recompute: extract the matches straight from the
    // table, run Hunter's MM twice with the same scale-12 fixed-point
    // denominators and micro-unit strengths — so a bug in the grid
    // algebra and a bug in the oracle's restatement can't cancel
    val li = Tables(spark, TestSpark.sf, "lineitem")
      .filter(col("l_linenumber") <= 2)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_suppkey").cast("long"),
        col("l_extendedprice").cast("string")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        BigDecimal(r.getString(3)))).toList
    val byOrder = li.groupBy(_._1)
    // all l1 × l2 combinations per order — the equi-join's semantics
    // (the test SF carries duplicate (orderkey, linenumber) rows, so
    // an order can contribute several matches)
    val matches: Seq[(Long, Long, Long)] = byOrder.values.flatMap { rows =>
      val firsts = rows.filter(_._2 == 1)
      val seconds = rows.filter(_._2 == 2)
      firsts.flatMap { a =>
        seconds.withFilter(b => a._3 != b._3).map { b =>
          val (sa, pa, sb, pb) = (a._3, a._4, b._3, b._4)
          val winner = if (pa > pb || (pa == pb && sa < sb)) sa else sb
          (sa, sb, winner)
        }
      }
    }.toSeq
    val supps = matches.flatMap(m => Seq(m._1, m._2)).distinct.sorted
    val wins = supps.map(s0 =>
      s0 -> matches.count(_._3 == s0).toLong).toMap
    val nm = supps.map(s0 =>
      s0 -> matches.count(m => m._1 == s0 || m._2 == s0).toLong).toMap
    val nij = matches.groupBy(m =>
      (math.min(m._1, m._2), math.max(m._1, m._2)))
      .view.mapValues(_.length.toLong).toMap
    def mm(se6: Map[Long, Long]): Map[Long, Long] = supps.map { i =>
      val den = nij.collect {
        case ((lo, hi), n) if lo == i || hi == i =>
          val j = if (lo == i) hi else lo
          val si = se6(i).toDouble / 1000000.0
          val sj = se6(j).toDouble / 1000000.0
          math.round(1.0e12 * n / (si + sj))
      }.sum
      i -> (if (wins(i) == 0L || den == 0L) 0L
      else math.round(1000000.0 * wins(i) / (den.toDouble / 1.0e12)))
    }.toMap
    val s1 = mm(supps.map(_ -> 1000000L).toMap)
    val s2 = mm(s1)
    val rows = run("q_bt_strength")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSet == supps.toSet)
    rows.foreach { case (supp, n, w, s1e, s2e, _) =>
      assert(n == nm(supp), s"n_matches($supp)")
      assert(w == wins(supp), s"wins($supp)")
      assert(s1e == s1(supp), s"s1($supp)")
      assert(s2e == s2(supp), s"s2($supp)")
    }
    // ranks follow (s2 desc, supp) exactly
    val expectRk = rows.sortBy(t => (-t._5, t._1)).map(_._1)
    assert(rows.sortBy(_._6).map(_._1).toSeq == expectRk.toSeq)
    // the estimator is non-degenerate on the fixture: strengths
    // spread, and the top-ranked contestant out-wins the bottom
    val byRank = rows.sortBy(_._6)
    assert(rows.map(_._5).distinct.length > rows.length / 2)
    assert(byRank.head._3.toDouble / byRank.head._2 >
      byRank.last._3.toDouble / math.max(byRank.last._2, 1))
  }
}
