package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the schema-discovery / data-audit pack — the
  * invariants the DuckDB value-equality oracle can't state: that the
  * audits actually discriminate on testdata (some dependency holds AND
  * some is violated — no vacuous all-pass), that derived ratios are
  * exactly the stated functions of the exact counts, and that the CUSUM
  * closed form equals the recursive textbook definition.
  */
class DiscoverySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    try graft.operators.Discovery.queries(name)(spark, TestSpark.sf).collect()
    finally TestSpark.housekeeping()

  test("q_fd_discovery: key FD holds, non-key FD violated, g3 exact") {
    val rows = run("q_fd_discovery")
    assert(rows.length == 4)
    val byFd = rows.map(r => r.getString(0) -> r).toMap
    val key = byFd("o_orderkey->o_custkey")
    assert(key.getBoolean(6) && key.getLong(2) == 0L &&
      key.getDouble(5) == 1.0, "key determinant must hold exactly")
    val nonKey = byFd("o_custkey->o_orderpriority")
    assert(!nonKey.getBoolean(6) && nonKey.getLong(2) > 0L)
    // all candidates fan out of the SAME scan: row totals must agree
    assert(rows.map(_.getLong(3)).distinct.length == 1)
    rows.foreach { r =>
      val (groups, viol, n, kept, g3) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))
      assert(viol <= groups && kept <= n && kept >= groups)
      assert(g3 == BigDecimal(kept.toDouble / n.toDouble)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getBoolean(6) == (viol == 0L))
      // holds ⇔ every group keeps all its rows under majority-class dedup
      assert(r.getBoolean(6) == (kept == n))
    }
  }

  test("q_ind_discovery: FK candidate found, reverse IND violated") {
    val rows = run("q_ind_discovery")
    assert(rows.length == 6)
    val byInd = rows.map(r => r.getString(0) -> r).toMap
    assert(byInd("orders.o_custkey<=customer.c_custkey").getBoolean(4))
    assert(byInd("lineitem.l_partkey<=part.p_partkey").getBoolean(4))
    val broken = byInd("customer.c_custkey<=events.user_id")
    assert(!broken.getBoolean(4) && broken.getDouble(3) < 0.2,
      "the 10x-wider key domain cannot be contained in the narrow one")
    rows.foreach { r =>
      val (ndv, hit) = (r.getLong(1), r.getLong(2))
      assert(hit <= ndv && ndv > 0)
      assert(r.getBoolean(4) == (ndv == hit))
      assert(r.getDouble(3) == BigDecimal(hit.toDouble / ndv.toDouble)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("q_benford: full 3x9 grid, shares and chi2 are exact restatements") {
    val rows = run("q_benford")
    assert(rows.length == 27)
    rows.groupBy(_.getString(0)).foreach { case (cn, g) =>
      assert(g.map(_.getLong(1)).sorted.toSeq == (1L to 9L), cn)
      val tot = g.map(_.getLong(2)).sum
      g.foreach { r =>
        assert(r.getLong(3) == tot, s"$cn n_total")
        val (n, d) = (r.getLong(2), r.getLong(1))
        def r9(x: Double) = BigDecimal(x)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getDouble(4) == r9(n.toDouble / tot.toDouble))
        assert(r.getDouble(5) == r9(math.log10(1.0 + 1.0 / d.toDouble)))
        val e = r.getDouble(5)
        val diff = n.toDouble - tot.toDouble * e
        assert(r.getDouble(6) == r9(diff * diff / (tot.toDouble * e)))
      }
      // chi2_col is the DECIMAL sum of the round-9 terms — exact
      val chi2 = g.map(r => BigDecimal(r.getDouble(6)).setScale(9,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      g.foreach(r => assert(r.getDouble(7) == chi2, s"$cn chi2_col"))
      // synthetic uniform-ish prices are far from Benford: the audit
      // must actually light up, not report ~0
      assert(chi2 > 1.0, s"$cn chi2=$chi2")
    }
  }

  test("q_cusum: closed form equals the recursive definition, flags split") {
    val rows = run("q_cusum")
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (t, g) =>
      val sorted = g.sortBy(_.getDate(1).toString)
      val xs = sorted.map(_.getLong(2))
      val tx = xs.sum; val nd = xs.length.toLong
      var sRec = 0L
      sorted.zip(xs).foreach { case (r, x) =>
        sRec = math.max(0L, sRec + (x * nd - tx))
        assert(r.getLong(3) == sRec, s"$t ${r.getDate(1)}")
        assert(r.getBoolean(4) == (sRec * 8 > tx))
        assert(sRec >= 0L)
      }
    }
    val flags = rows.map(_.getBoolean(4)).distinct
    assert(flags.contains(true) && flags.contains(false),
      "drift threshold must discriminate on testdata")
  }

  test("q_record_linkage: every true pair accounted for, zero false matches") {
    val rows = run("q_record_linkage")
    val byKey = rows.map(r =>
      (r.getString(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    val nLeft = Tables(spark, TestSpark.sf, "customer").count()
    TestSpark.housekeeping()
    // conservation: every left record's true pair lands in exactly one
    // bucket — found (any decision) or lost to blocking
    val trueTotal = byKey.collect { case ((_, true), n) => n }.sum
    assert(trueTotal == nLeft, s"$trueTotal vs $nLeft")
    // blocking recall cost is real on this perturbation (band nudges)
    assert(byKey.getOrElse(("missed_by_blocking", true), 0L) > 0L)
    // the weight thresholds never promote a wrong pair to match here:
    // two agreeing fields are needed to clear +10
    assert(!byKey.contains(("match", false)), byKey.toString)
    assert(byKey.getOrElse(("match", true), 0L) > 0L)
    // co-blocked non-pairs exist and score nonmatch (the u-probability
    // population)
    assert(byKey.getOrElse(("nonmatch", false), 0L) > 0L)
  }

  test("q_impute: observed rows untouched, holes get their group mean") {
    val rows = run("q_impute")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2) == (r.getLong(0) % 7 == 0), "flag rule")
      assert(!r.isNullAt(3), "every type has observed rows to fill from")
    }
    val (miss, obs) = rows.partition(_.getBoolean(2))
    assert(miss.nonEmpty && obs.nonEmpty)
    // every missing row of a type carries ONE value: the observed mean
    miss.groupBy(_.getString(1)).foreach { case (t, g) =>
      assert(g.map(_.getDouble(3)).distinct.length == 1, t)
      val om = obs.filter(_.getString(1) == t).map(_.getDouble(3))
      val mean = BigDecimal(om.map(BigDecimal(_)).sum.toDouble / om.length)
      // group mean of the (already round-6) observed values agrees to
      // rounding noise with the exact-cents fill
      assert(math.abs(g.head.getDouble(3) - mean.toDouble) < 1e-3, t)
    }
  }

  test("q_stream_cusum: drained state re-derives the batch CUSUM exactly") {
    val batch = run("q_cusum").map(r =>
      (r.getString(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getLong(2), r.getLong(3), r.getBoolean(4))).toSet
    val streamed =
      try graft.operators.StreamingGate
        .queries("q_stream_cusum")(spark, TestSpark.sf).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4))).toSet
      finally TestSpark.housekeeping()
    assert(streamed == batch,
      "incremental fold + closed form must equal the batch statistic")
  }

  test("q_ind_discovery reports vacuous containment on empty tables") {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-ind")
      .toFile.getAbsolutePath
    Seq("customer", "events", "nation", "lineitem", "part", "orders")
      .foreach { t =>
        Tables(spark, TestSpark.sf, t).limit(0).coalesce(1)
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
      }
    val rows =
      try graft.operators.Discovery.queries("q_ind_discovery")(spark, dir)
        .collect()
      finally TestSpark.housekeeping()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L)
      assert(r.isNullAt(3), "containment must be NULL, not NaN, on empty")
      assert(r.getBoolean(4), "vacuous truth on the empty domain")
    }
  }
}
