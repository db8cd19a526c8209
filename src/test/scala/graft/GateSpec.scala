package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the composed quality gate and the SCD2 reconstruction
  * that the DuckDB oracle can't state (it only proves value equality):
  * gate-order determinism and interval-chain well-formedness.
  */
class GateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("q_quality_gate: reason is the FIRST failing gate, keep <=> no reason") {
    val rows = graft.operators.TextAnalytics
      .queries("q_quality_gate")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nTok = r.getLong(r.fieldIndex("n_tokens"))
      val nStop = r.getLong(r.fieldIndex("n_stop"))
      val pred = r.getString(r.fieldIndex("pred_lang"))
      val keep = r.getBoolean(r.fieldIndex("keep"))
      val reason = Option(r.getAs[String]("reason"))
      assert(keep == reason.isEmpty)
      val expected =
        if (nTok < 5 || nTok > 2000) Some("length")
        else if (!Set("en", "es").contains(pred)) Some("lang")
        else if (nStop < 2) Some("stopwords")
        else if (r.getDouble(r.fieldIndex("distinct_ratio")) < 0.3 ||
          r.getDouble(r.fieldIndex("top_bigram_frac")) > 0.18) Some("repetition")
        else None
      assert(reason == expected, s"doc ${r.get(0)}: $reason vs $expected")
    }
    // the gate must actually discriminate on testdata, not pass-all/drop-all
    val kept = rows.count(_.getBoolean(rows.head.fieldIndex("keep")))
    assert(kept > 0 && kept < rows.length)
  }

  test("q_scd2: per-user interval chains are contiguous, dense, one current") {
    val rows = graft.operators.Extras
      .queries("q_scd2")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (user, history) =>
      val h = history.sortBy(_.getLong(4)) // version
      // dense versions from 1
      assert(h.map(_.getLong(4)).toSeq == (1L to h.length).toSeq, s"user $user")
      // contiguous: valid_to(i) == valid_from(i+1)
      h.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(3) == b.getLong(2), s"user $user gap")
          // consecutive versions must change the attribute
          assert(a.getString(1) != b.getString(1), s"user $user no-op version")
        case _ =>
      }
      // exactly one open (current) interval, and it is the last version
      val current = h.filter(_.isNullAt(3))
      assert(current.length == 1 && (current.head eq h.last), s"user $user")
    }
  }

  test("q_dedup_pipeline: stage attribution matches stage definitions") {
    val rows = graft.operators.Dedup
      .queries("q_dedup_pipeline")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val reason = Option(r.getAs[String]("reason"))
      assert(r.getBoolean(1) == reason.isEmpty)
      reason.foreach(x => assert(
        Set("exact", "neardup", "benchmark", "contaminated")(x), x))
    }
    // every derived exact copy (+100000) drops at the exact stage
    rows.filter(r => r.getLong(0) >= 100000 && r.getLong(0) < 200000)
      .foreach(r => assert(r.getAs[String]("reason") == "exact",
        s"doc ${r.getLong(0)}"))
    // every derived near copy (+200000, first token removed) drops at
    // the near-dup stage — its smaller-id original survives stage 1
    rows.filter(_.getLong(0) >= 200000)
      .foreach(r => assert(r.getAs[String]("reason") == "neardup",
        s"doc ${r.getLong(0)}"))
    // surviving eval-set members leave with reason 'benchmark'
    rows.filter(r => r.getLong(0) < 100000 && r.getLong(0) % 50 == 3)
      .foreach(r => assert(!r.getBoolean(1), s"doc ${r.getLong(0)} kept"))
    val kept = rows.count(_.getBoolean(1))
    assert(kept > 0 && kept < rows.length)
  }

  test("q_kanon: generalizing never increases rows at risk (lattice monotone)") {
    // a coarser class is a union of finer classes, and a union below k
    // forces every part below k — so rows_at_risk must be monotone
    // non-increasing up the ladder 0 → 1 → 3
    val rows = graft.operators.Extras
      .queries("q_kanon")(spark, TestSpark.sf).collect()
      .map(r => r.getLong(r.fieldIndex("level")) ->
        r.getLong(r.fieldIndex("rows_at_risk"))).toMap
    assert(rows.keySet == Set(0L, 1L, 3L))
    assert(rows(1L) <= rows(0L), rows.toString)
    assert(rows(3L) <= rows(1L), rows.toString)
  }

  test("q_assoc_rules: supports are consistent and lift is the stated ratio") {
    val rows = graft.operators.Analytic
      .queries("q_assoc_rules")(spark, TestSpark.sf).collect()
    TestSpark.housekeeping() // the distinct basket frame is persisted
    assert(rows.nonEmpty)
    val nOrders = Tables(spark, TestSpark.sf, "lineitem")
      .select(org.apache.spark.sql.functions.col("l_orderkey"))
      .distinct().count()
    rows.foreach { r =>
      val ab = r.getLong(r.fieldIndex("supp_ab"))
      val a = r.getLong(r.fieldIndex("supp_a"))
      val b = r.getLong(r.fieldIndex("supp_b"))
      assert(ab >= 2 && ab <= math.min(a, b))
      assert(r.getDouble(r.fieldIndex("lift")) ==
        (ab * nOrders).toDouble / (a * b).toDouble)
    }
  }

  test("q_regression: matches a brute-force double OLS; r2 in [0,1]") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.Analytic
      .queries("q_regression")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val raw = Tables(spark, TestSpark.sf, "events")
      .select(col("event_type"), col("ts").cast("long"), col("value"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1) / 86400L).toDouble,
        r.getDouble(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val et = r.getString(r.fieldIndex("event_type"))
      val pts = raw(et)
      val n = pts.length.toDouble
      val sx = pts.map(_._2).sum; val sy = pts.map(_._3).sum
      val sxx = pts.map(p => p._2 * p._2).sum
      val sxy = pts.map(p => p._2 * p._3).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val icept = (sy - slope * sx) / n
      assert(math.abs(r.getDouble(r.fieldIndex("slope")) - slope) < 1e-6,
        s"$et slope")
      assert(math.abs(r.getDouble(r.fieldIndex("intercept")) - icept) < 1e-4,
        s"$et intercept")
      val r2 = r.getDouble(r.fieldIndex("r2"))
      assert(r2 >= 0d && r2 <= 1d, s"$et r2=$r2")
    }
  }

  test("q_table_stats: manifest rows agree with per-column direct scans") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    val rows = graft.operators.Analytic
      .queries("q_table_stats")(spark, TestSpark.sf).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("l_discount", "l_extendedprice", "l_orderkey", "l_quantity"))
    val li = Tables(spark, TestSpark.sf, "lineitem")
    rows.foreach { r =>
      val c = r.getString(r.fieldIndex("column_name"))
      val direct = li.agg(
        countDistinct(col(c)),
        org.apache.spark.sql.functions.min(col(c).cast("double")),
        org.apache.spark.sql.functions.max(col(c).cast("double"))).head()
      assert(r.getLong(r.fieldIndex("n_null")) == 0L)
      assert(r.getLong(r.fieldIndex("ndv")) == direct.getLong(0), c)
      assert(r.getDouble(r.fieldIndex("vmin")) == direct.getDouble(1), c)
      assert(r.getDouble(r.fieldIndex("vmax")) == direct.getDouble(2), c)
    }
  }

  test("q_kcore: equals an in-memory peel; all degrees >= K; peel bites") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.Analytic
      .queries("q_kcore")(spark, TestSpark.sf).collect()
      .map(r => r.getLong(r.fieldIndex("part")) ->
        r.getLong(r.fieldIndex("core_deg"))).toMap
    TestSpark.housekeeping() // the loop localCheckpoints edge frames
    assert(rows.nonEmpty)
    assert(rows.values.forall(_ >= 8L), "a core node below K survived")
    // brute-force reference peel over the same raw co-occurrence edges
    val li = Tables(spark, TestSpark.sf, "lineitem")
      .filter(col("l_orderkey") % 8 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var edges = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.size) yield (ps(i), ps(j))
    }.toSet
    var changed = true
    while (changed) {
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val next = edges.filter(e => deg(e._1) >= 8L && deg(e._2) >= 8L)
      changed = next.size != edges.size
      edges = next
    }
    val expect = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows == expect)
    // and the peel must actually have removed nodes on testdata
    val allNodes = li.map(_._2).toSet.size
    assert(rows.size < allNodes)
  }

  test("q_full_outer: key union is exact; BOTH orphan directions appear") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.Extras
      .queries("q_full_outer")(spark, TestSpark.sf).collect()
    val dim = Tables(spark, TestSpark.sf, "customer")
      .filter(col("c_mktsegment") =!= "MACHINERY")
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    val fact = Tables(spark, TestSpark.sf, "orders")
      .filter(col("o_orderstatus") === "O")
      .select(col("o_custkey")).distinct().collect().map(_.getLong(0)).toSet
    // one row per key in the UNION of both sides, each key once
    assert(rows.map(_.getLong(0)).toSet == (dim ++ fact))
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    // dim-only keys: zero-filled; fact-only keys: has_customer=false.
    // Both directions must be non-empty on testdata or the full-outer
    // semantics are vacuously green (then this flags the fixture).
    val dimOnly = rows.filter(r => !fact.contains(r.getLong(0)))
    val factOnly = rows.filter(r => !dim.contains(r.getLong(0)))
    assert(dimOnly.nonEmpty && factOnly.nonEmpty)
    dimOnly.foreach { r =>
      assert(r.getBoolean(1) && r.getLong(2) == 0L && r.getDouble(3) == 0d) }
    factOnly.foreach { r => assert(!r.getBoolean(1) && r.getLong(2) > 0L) }
  }

  test("q_incremental_agg: both partials are non-empty (merge not vacuous)") {
    import org.apache.spark.sql.functions.{col, floor, max, unix_seconds}
    val ev = Tables(spark, TestSpark.sf, "events")
      .select(floor(unix_seconds(col("ts")).cast("double") / 86400d)
        .cast("long").as("day"))
    val cut = ev.agg(max(col("day")) - 7L).head().getLong(0)
    val base = ev.filter(col("day") < cut).count()
    val delta = ev.filter(col("day") >= cut).count()
    assert(base > 0 && delta > 0,
      s"base=$base delta=$delta — the IVM merge would be a no-op; " +
        "the oracle equivalence merge(partials)==rescan(all) is only " +
        "meaningful when both sides contribute")
    val rows = graft.operators.Extras
      .queries("q_incremental_agg")(spark, TestSpark.sf).collect()
    assert(rows.map(_.getLong(1)).sum == base + delta)
  }

  test("q_chi_square: margins and totals are self-consistent") {
    val rows = graft.operators.Analytic
      .queries("q_chi_square")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val n = Tables(spark, TestSpark.sf, "events").count()
    assert(rows.map(_.getLong(2)).sum == n)         // cells partition N
    val chi2s = rows.map(_.getDouble(5)).distinct
    assert(chi2s.length == 1)                        // one global stat
    assert(math.abs(rows.map(_.getDouble(3)).sum - n) < 1e-3) // Σe ≈ N
    rows.foreach(r => assert(r.getDouble(4) >= 0d))  // contribs >= 0
    assert(math.abs(chi2s.head - rows.map(_.getDouble(4)).sum) < 1e-6)
  }

  test("q_bfs_distance: 1-Lipschitz along edges, hubs at zero, multi-hop") {
    import org.apache.spark.sql.functions.col
    val dist = graft.operators.Analytic
      .queries("q_bfs_distance")(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    TestSpark.housekeeping() // the loop localCheckpoints frames
    assert(dist.nonEmpty)
    // exactly BFS_HUBS sources at distance zero
    assert(dist.values.count(_ == 0L) == 10)
    // BFS reached beyond the hubs' immediate neighborhood on testdata
    assert(dist.values.max >= 2L)
    // the defining property: along any edge, distances differ by <= 1
    // (both endpoints settled), and an unsettled endpoint can only
    // neighbor nodes at the hop cap
    val li = Tables(spark, TestSpark.sf, "lineitem")
      .filter(col("l_orderkey") % 8 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.size) yield (ps(i), ps(j))
    }
    edges.foreach { case (u, v) =>
      (dist.get(u), dist.get(v)) match {
        case (Some(du), Some(dv)) => assert(math.abs(du - dv) <= 1L)
        case (Some(du), None) => assert(du == 8L, s"$u settled at $du " +
          s"but neighbor $v unreached — frontier missed it")
        case (None, Some(dv)) => assert(dv == 8L)
        case _ => ()
      }
    }
  }

  test("q_rake_keywords: equals a brute-force RAKE; phrases stopword-free") {
    import org.apache.spark.sql.functions.col
    val out = graft.operators.TextAnalytics
      .queries("q_rake_keywords")(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(out.nonEmpty && out.length <= 15)
    val stop = graft.operators.TextAnalytics.stopwords.toSet
    def content(w: String) =
      w.length > 1 && !w.startsWith("http") && !stop(w)
    out.foreach { case (p, _, _) =>
      assert(p.split(" ").forall(content), s"boundary token inside: '$p'") }
    // brute-force RAKE over the raw text
    val texts = Tables(spark, TestSpark.sf, "documents")
      .select(col("text")).collect().map(_.getString(0).toLowerCase)
    val phrases = texts.flatMap { t =>
      val words = t.split(" ").filter(_.nonEmpty)
      val runs = scala.collection.mutable.ArrayBuffer[List[String]]()
      var cur = List.empty[String]
      words.foreach { w =>
        if (content(w)) cur = cur :+ w
        else { if (cur.nonEmpty) runs += cur; cur = Nil }
      }
      if (cur.nonEmpty) runs += cur
      runs
    }
    val freq = phrases.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val deg = phrases.flatMap(p => p.map(_ -> p.size.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def wscore(w: String) = BigDecimal(deg(w).toDouble / freq(w))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val pscore = phrases.map(p => p.mkString(" ") -> p.map(wscore).sum)
      .groupBy(_._1).map { case (p, xs) =>
        p -> (BigDecimal(xs.head._2.toDouble).toDouble, xs.size.toLong) }
    val expectTop = pscore.toSeq
      .map { case (p, (s, n)) =>
        (p, BigDecimal(s).setScale(9, BigDecimal.RoundingMode.HALF_UP)
          .toDouble, n) }
      .sortBy { case (p, s, _) => (-s, p) }.take(15)
    assert(out.toSeq == expectTop)
  }

  test("q_stream_enrich: both join paths fire; one output row per event") {
    val rows = graft.operators.StreamingGate
      .queries("q_stream_enrich")(spark, TestSpark.sf).collect()
    TestSpark.housekeeping()
    val n = Tables(spark, TestSpark.sf, "events").count()
    assert(rows.length.toLong == n) // left outer: nothing dropped or duped
    val segs = rows.map(_.getString(2)).toSet
    assert(segs.contains("UNKNOWN") && segs.contains("BUILDING"),
      s"one join path vacuous: $segs")
  }

  test("q_dq_checks: metrics agree with direct recomputation; passed <=> 1.0") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.Extras
      .queries("q_dq_checks")(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(rows.size == 5)
    rows.values.foreach { case (m, p) => assert(p == (m == 1.0d)) }
    val o = Tables(spark, TestSpark.sf, "orders")
    val n = o.count().toDouble
    val uniq = o.select(col("o_orderkey")).distinct().count() / n
    assert(math.abs(rows("uniqueness:o_orderkey")._1 - uniq) < 1e-9)
    val fk = o.select(col("o_custkey")).distinct()
    val fkN = fk.count().toDouble
    val orphans = fk.join(Tables(spark, TestSpark.sf, "customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(math.abs(rows("referential:o_custkey->customer")._1 -
      (fkN - orphans) / fkN) < 1e-9)
  }

  test("q_decay_score: equals an exact BigDecimal recomputation per user") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.Analytic
      .queries("q_decay_score")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val ev = Tables(spark, TestSpark.sf, "events")
      .select(col("user_id"), col("ts").cast("date").cast("string"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1)),
        BigDecimal(r.getDouble(2)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)))
    val refDay = ev.map(_._2).maxBy(_.toEpochDay)
    val expect = ev.groupBy(_._1).map { case (u, es) =>
      val s = es.map { case (_, day, y) =>
        val wk = math.min(
          java.time.temporal.ChronoUnit.DAYS.between(day, refDay) / 7, 10L)
        y * BigDecimal(1L << (10 - wk).toInt)
      }.sum
      u -> (s.toDouble / 1024d)
    }
    rows.foreach { r =>
      val u = r.getLong(r.fieldIndex("user_id"))
      assert(math.abs(r.getDouble(r.fieldIndex("score")) - expect(u)) < 1e-8,
        s"user $u")
    }
    // decay must actually bite on testdata: a user's score is below its
    // undecayed sum unless every event sits in the newest week
    val undecayed = ev.groupBy(_._1).map { case (u, es) =>
      u -> es.map(_._3).sum.toDouble }
    assert(rows.exists { r =>
      r.getDouble(r.fieldIndex("score")) <
        undecayed(r.getLong(r.fieldIndex("user_id"))) - 1e-9 })
  }

  test("q_attribution: credited click is the user's latest in-window click") {
    import org.apache.spark.sql.functions.col
    val out = graft.operators.Analytic
      .queries("q_attribution")(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3)))
    assert(out.nonEmpty)
    assert(out.exists(_._3.isDefined), "no purchase was attributed")
    assert(out.exists(_._3.isEmpty), "every purchase attributed — lookback gate vacuous")
    val ev = Tables(spark, TestSpark.sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byId = ev.map(e => e._1 -> e).toMap
    val purchases = ev.filter(_._3 == "purchase").map(_._1).toSet
    assert(out.map(_._1).toSet == purchases, "output is not exactly the purchase set")
    val look = 7L * 86400 * 1000000
    out.foreach { case (pid, uid, att, flag) =>
      assert(flag == att.isDefined)
      val (_, _, _, pus) = byId(pid)
      // latest strictly-preceding click by (us, event_id) order
      val best = ev.filter(e => e._2 == uid && e._3 == "click" &&
          (e._4 < pus || (e._4 == pus && e._1 < pid)))
        .sortBy(e => (e._4, e._1)).lastOption
      val expected = best.filter(b => pus - b._4 <= look).map(_._1)
      assert(att == expected, s"purchase $pid: got $att expected $expected")
    }
  }

  test("q_random_walks: full-length traces whose steps are real edges") {
    import org.apache.spark.sql.functions.col
    val out = graft.operators.Analytic
      .queries("q_random_walks")(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    val li = Tables(spark, TestSpark.sf, "lineitem")
      .filter(col("l_orderkey") % 8 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.toSet
    val byWalk = out.groupBy(_._1)
    byWalk.foreach { case (walk, rows) =>
      // a full trace: steps 0..4, exactly one node per step, start=walk
      assert(rows.map(_._2).sorted.toSeq == (0L to 4L),
        s"walk $walk steps ${rows.map(_._2).sorted.toSeq}")
      val path = rows.sortBy(_._2).map(_._3)
      assert(path.head == walk)
      path.sliding(2).foreach { case Array(a, b) =>
        assert(edges.contains((a, b)), s"walk $walk used non-edge $a->$b")
      case _ => ()
      }
    }
    // sampled starts: every graph node with id % 50 == 0 walks
    val nodes = edges.map(_._1)
    assert(byWalk.keySet == nodes.filter(_ % 50 == 0),
      "walk set is not exactly the sampled start class")
  }

  test("q_link_predict: scores match brute force under the hub cap") {
    import org.apache.spark.sql.functions.col
    val out = graft.operators.Analytic
      .queries("q_link_predict")(spark, TestSpark.sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out.nonEmpty)
    val li = Tables(spark, TestSpark.sf, "lineitem")
      .filter(col("l_orderkey") % 8 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.size) yield (ps(i), ps(j))
    }.toSet
    val nbrs = und.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = nbrs.view.mapValues(_.size.toLong).toMap
    val expected = for {
      a <- nbrs.keySet; b <- nbrs.keySet
      if a < b && !und.contains((a, b))
      common = nbrs(a).intersect(nbrs(b)).filter(m => deg(m) <= 64)
      if common.size >= 2
    } yield (a, b) -> common
    assert(out.keySet == expected.map(_._1),
      s"pair sets differ: missing=${(expected.map(_._1) -- out.keySet).take(3)} " +
        s"extra=${(out.keySet -- expected.map(_._1)).take(3)}")
    expected.foreach { case ((a, b), common) =>
      val (cn, jac, aa) = out((a, b))
      assert(cn == common.size.toLong)
      val expJac = BigDecimal(cn.toDouble / (deg(a) + deg(b) - cn))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(jac - expJac) < 1e-12, s"($a,$b) jaccard $jac vs $expJac")
      val expAa = common.toSeq.map(m =>
        BigDecimal(1.0 / math.log(deg(m).toDouble))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      assert(math.abs(aa - expAa) < 1e-9, s"($a,$b) aa $aa vs $expAa")
    }
  }

  test("q_ewma: equals an exact BigDecimal 16-tap recomputation per user") {
    import org.apache.spark.sql.functions.col
    val out = graft.operators.Analytic
      .queries("q_ewma")(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out.nonEmpty)
    val ev = Tables(spark, TestSpark.sf, "events")
      .select(col("event_id"), col("user_id"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("us"),
        col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        BigDecimal(r.getDecimal(3))))
    val half = BigDecimal(0.5)
    ev.groupBy(_._2).values.foreach { grp =>
      val ordered = grp.sortBy(e => (e._3, e._1)).toIndexedSeq
      ordered.indices.foreach { i =>
        val exact = (0 until 16).map { j =>
          if (i - j >= 0) ordered(i - j)._4 * half.pow(j) else BigDecimal(0)
        }.sum
        assert(math.abs(out(ordered(i)._1) - exact.toDouble) < 1e-12,
          s"event ${ordered(i)._1}: ${out(ordered(i)._1)} vs $exact")
      }
    }
  }

  test("q_cdf_normalize: ecdf is a per-type CDF (monotone, tops at 1)") {
    val rows = graft.operators.Analytic
      .queries("q_cdf_normalize")(spark, TestSpark.sf).collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { grp =>
      val byV = grp.sortBy(_._2)
      // monotone non-decreasing in value; same value -> same ecdf
      byV.sliding(2).foreach {
        case Array((_, v1, e1), (_, v2, e2)) =>
          if (v1 == v2) assert(e1 == e2) else assert(e1 <= e2)
        case _ => ()
      }
      assert(math.abs(byV.last._3 - 1.0) < 1e-9, "CDF does not top at 1")
      assert(byV.head._3 > 0.0)
    }
  }

  test("q_seasonal_decompose: components re-add and are grid-constant") {
    val rows = graft.operators.Analytic
      .queries("q_seasonal_decompose")(spark, TestSpark.sf).collect()
    TestSpark.housekeeping()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (x, t, s2, res) = (r.getLong(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6))
      assert(math.abs(x - t - s2 - res) < 2e-9,
        s"identity at ${r.getString(0)}/${r.getLong(1)}/${r.getLong(2)}")
    }
    // trend constant within (type, day); seasonal within (type, hod)
    rows.groupBy(r => (r.getString(0), r.getLong(1))).foreach {
      case (k, g) =>
        assert(g.map(_.getDouble(4)).distinct.length == 1, s"trend $k")
    }
    rows.groupBy(r => (r.getString(0), r.getLong(2))).foreach {
      case (k, g) =>
        assert(g.map(_.getDouble(5)).distinct.length == 1, s"seasonal $k")
    }
    // residuals center near zero per type (the alerting contract)
    rows.groupBy(_.getString(0)).foreach { case (t, g) =>
      val mean = g.map(_.getDouble(6)).sum / g.length
      assert(math.abs(mean) < 0.1, s"$t residual mean $mean")
    }
  }

  test("q_erasure_maintenance: decrement conserves and really erases") {
    val rows = graft.operators.Extras
      .queries("q_erasure_maintenance")(spark, TestSpark.sf).collect()
    TestSpark.housekeeping()
    assert(rows.nonEmpty)
    val byType = Tables(spark, TestSpark.sf, "events")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    TestSpark.housekeeping()
    rows.foreach { r =>
      assert(r.getBoolean(4), "maintained must equal the rescan")
      assert(r.getLong(1) > 0, "the erasure cohort must be non-empty")
      assert(r.getLong(1) + r.getLong(2) == byType(r.getString(0)),
        s"${r.getString(0)} conservation")
    }
  }

  test("q_acf: full lag grid, bounded coefficients, shrinking pairs") {
    val rows = graft.operators.Analytic
      .queries("q_acf")(spark, TestSpark.sf).collect()
    TestSpark.housekeeping()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (t, g) =>
      val byLag = g.sortBy(_.getLong(1))
      assert(byLag.map(_.getLong(1)).toSeq == (1L to 24L), t)
      byLag.foreach(r => assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9,
        s"$t lag ${r.getLong(1)}: ${r.getDouble(3)}"))
      // pairs come from the hour equi-join, never more than the grid
      // minus the lag (sparse small-SF grids have gaps, so pair
      // counts need not be monotone in the lag)
      byLag.foreach(r => assert(r.getLong(2) > 0, t))
    }
  }

  test("q_geo_fence: membership equals a brute-force point test") {
    val rows = graft.operators.Scalars
      .queries("q_geo_fence")(spark, TestSpark.sf).collect()
    TestSpark.housekeeping()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("ne_square", "tri_equator", "w_square"))
    val keys = Tables(spark, TestSpark.sf, "customer")
      .select(org.apache.spark.sql.functions.col("c_custkey"))
      .collect().map(_.getLong(0))
    TestSpark.housekeeping()
    val fences = Map(
      "tri_equator" -> Seq((0L, 0L), (60L, 0L), (30L, 50L)),
      "w_square" -> Seq((-150L, -75L), (-100L, -75L), (-100L, -25L),
        (-150L, -25L)),
      "ne_square" -> Seq((100L, 10L), (160L, 10L), (160L, 70L),
        (100L, 70L)))
    rows.foreach { r =>
      val vs = fences(r.getString(0))
      val inside = keys.count { k =>
        val (px, py) = (k % 350 - 175, k % 170 - 85)
        vs.zip(vs.tail :+ vs.head).forall { case ((x1, y1), (x2, y2)) =>
          (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1) >= 0
        }
      }
      assert(r.getLong(2) == inside, r.getString(0))
      assert(r.getLong(1) == keys.length)
      assert(r.getLong(3) <= r.getLong(2), "boundary points are inside")
    }
    // the fences must actually catch points — not a vacuous filter
    assert(rows.map(_.getLong(2)).sum > 0)
    assert(rows.exists(r => r.getLong(2) < r.getLong(1)))
  }

  test("q_gini: bounded, exclusions counted, brute-force agreement") {
    val rows = graft.operators.Analytic
      .queries("q_gini")(spark, TestSpark.sf).collect()
    TestSpark.housekeeping()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0)
      assert(r.getLong(1) >= r.getLong(2), "n_all must cover exclusions")
    }
    // independent brute force on one segment
    val seg = rows.head.getString(0)
    val cents = Tables(spark, TestSpark.sf, "customer")
      .filter(org.apache.spark.sql.functions.col("c_mktsegment") === seg)
      .select(org.apache.spark.sql.functions.col("c_custkey"),
        (org.apache.spark.sql.functions.col("c_acctbal")
          .cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
          .cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._2 > 0).sortBy(t => (t._2, t._1)).map(_._2)
    TestSpark.housekeeping()
    val n = cents.length.toLong
    val num = cents.zipWithIndex
      .map { case (c, i) => (2L * (i + 1) - n - 1) * c }.sum
    val expect = BigDecimal(num.toDouble / (n * cents.sum).toDouble)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.head.getDouble(3) == expect, s"$seg gini")
  }

  test("q_spearman: rho bounded and equal to a brute-force recompute") {
    val rows = graft.operators.Analytic
      .queries("q_spearman")(spark, TestSpark.sf).collect()
    TestSpark.housekeeping()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0))
    import org.apache.spark.sql.functions.{col => C}
    val seg = rows.head.getString(0)
    val data = Tables(spark, TestSpark.sf, "orders")
      .join(Tables(spark, TestSpark.sf, "customer"),
        C("o_custkey") === C("c_custkey"))
      .filter(C("c_mktsegment") === seg)
      .select(C("o_orderkey"),
        (C("o_totalprice").cast(
          org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
          .cast("long"),
        (C("c_acctbal").cast(
          org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
          .cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    TestSpark.housekeeping()
    val rx = data.sortBy(t => (t._2, t._1)).zipWithIndex
      .map { case (t, i) => t._1 -> (i + 1L) }.toMap
    val ry = data.sortBy(t => (t._3, t._1)).zipWithIndex
      .map { case (t, i) => t._1 -> (i + 1L) }.toMap
    val n = data.length.toLong
    val sd2 = data.map(t => { val d = rx(t._1) - ry(t._1); d * d }).sum
    val expect = BigDecimal(1.0 - 6.0 * sd2.toDouble /
      (n * (n * n - 1)).toDouble)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.head.getDouble(2) == expect, s"$seg rho")
  }

  test("q_welch_ttest: moments account for every purchase, dof bounded") {
    val rows = graft.operators.Inference
      .queries("q_welch_ttest")(spark, TestSpark.sf).collect()
    TestSpark.housekeeping()
    assert(rows.length == 1)
    val r = rows.head
    val total = Tables(spark, TestSpark.sf, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .count()
    TestSpark.housekeeping()
    assert(r.getLong(0) + r.getLong(1) == total)
    val dof = r.getDouble(5)
    assert(dof >= math.min(r.getLong(0), r.getLong(1)) - 1.0 &&
      dof <= r.getLong(0) + r.getLong(1) - 2.0)
    // t sign agrees with the mean difference
    assert((r.getDouble(4) > 0) == (r.getDouble(2) > r.getDouble(3)) ||
      r.getDouble(4) == 0.0)
    assert(r.getBoolean(6) == (math.abs(r.getDouble(4)) > 1.96))
  }

  test("q_source_overlap: full pair grid, jaccard restates the counts") {
    val rows = graft.operators.TextAnalytics
      .queries("q_source_overlap")(spark, TestSpark.sf).collect()
    TestSpark.housekeeping()
    val sources = (rows.map(_.getString(0)) ++ rows.map(_.getString(1)))
      .distinct.length
    assert(rows.length == sources * (sources - 1) / 2,
      "one row per unordered source pair")
    rows.foreach { r =>
      val (v1, v2, c) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(r.getString(0) < r.getString(1))
      assert(c <= math.min(v1, v2))
      val expect = BigDecimal(c.toDouble / (v1 + v2 - c).toDouble)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(5) == expect)
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
    // word-soup sources genuinely overlap: the metric must not be 0
    assert(rows.exists(_.getDouble(5) > 0.0))
  }

  test("q_dp_counts: real Laplace(2) noise, reproducible, true counts withheld") {
    val rows = graft.operators.Extras
      .queries("q_dp_counts")(spark, TestSpark.sf).collect()
    TestSpark.housekeeping()
    assert(rows.nonEmpty)
    val truth = Tables(spark, TestSpark.sf, "customer")
      .groupBy("c_mktsegment", "c_nationkey").count().collect()
      .map(r => (r.getString(0), r.getInt(1).toLong) -> r.getLong(2)).toMap
    TestSpark.housekeeping()
    val noises = rows.map { r =>
      val t = truth((r.getString(0), r.getLong(1)))
      r.getDouble(3) - t
    }
    // noise is really there (not all zero), centered-ish, Laplace(b=2)
    // scale: median |noise| = 2 ln 2 ≈ 1.39 — loose band, tails bounded
    val absN = noises.map(math.abs).sorted
    assert(absN.last > 0.0, "noise must be nonzero somewhere")
    val med = absN(absN.length / 2)
    assert(med > 0.3 && med < 5.0, s"median |noise| $med out of band")
    assert(absN.last < 60.0, "tail beyond any plausible Laplace(2) draw")
    // deterministic release: same cell -> same noise on a second run
    val again = graft.operators.Extras
      .queries("q_dp_counts")(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    TestSpark.housekeeping()
    rows.foreach(r =>
      assert(again((r.getString(0), r.getLong(1))) == r.getDouble(3)))
  }

  test("q_feature_hash: 64-slot range, signed cancellation, mass bound") {
    val rows = graft.operators.TextAnalytics
      .queries("q_feature_hash")(spark, TestSpark.sf).collect()
    TestSpark.housekeeping()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) < 64, "slot range")
      assert(r.getLong(2) != 0L, "zero slots must be filtered")
    }
    // the sign hash must actually split: both polarities appear
    assert(rows.exists(_.getLong(2) > 0) && rows.exists(_.getLong(2) < 0))
    // per-doc: at most 64 slots, and |sum of values| <= token count
    val nTok = Tables(spark, TestSpark.sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.size(org.apache.spark.sql.functions
          .split(org.apache.spark.sql.functions.lower(
            org.apache.spark.sql.functions.col("text")), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    TestSpark.housekeeping()
    rows.groupBy(_.getLong(0)).foreach { case (doc, g) =>
      assert(g.length <= 64, s"doc $doc")
      assert(g.map(r => math.abs(r.getLong(2))).sum <= nTok(doc),
        s"doc $doc mass exceeds token count")
    }
  }

  test("q_curation_pipeline: stage order, md5 mixture/shard rules, funnel invariants") {
    val rows = graft.operators.Curation
      .queries("q_curation_pipeline")(spark, TestSpark.sf).collect()
    TestSpark.housekeeping()
    assert(rows.nonEmpty)
    val validReasons = Set("length", "lang", "stopwords", "repetition",
      "exact", "neardup", "benchmark", "contaminated", "mixture")
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Long = {
      val hex = md.digest(id.toString
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(b => f"$b%02x").mkString.take(4)
      java.lang.Long.parseLong(hex, 16)
    }
    def frac(src: String): Double = {
      val i = src.drop(3).toInt
      if (i < 5) 1.0 else if (i < 10) 0.5 else if (i < 15) 0.25 else 0.1
    }
    rows.foreach { r =>
      val id = r.getLong(0); val src = r.getString(1)
      val keep = r.getBoolean(2)
      val reason = Option(r.getAs[String]("reason"))
      assert(keep == reason.isEmpty, s"doc $id")
      reason.foreach(x => assert(validReasons(x), s"doc $id: $x"))
      if (keep) {
        // a keeper passed the mixture draw and got the md5 shard
        assert(bucket(id) < frac(src) * 65536, s"doc $id kept past its draw")
        assert(!r.isNullAt(r.fieldIndex("shard")) &&
          r.getLong(r.fieldIndex("shard")) == bucket(id) % 32, s"doc $id")
      } else
        assert(r.isNullAt(r.fieldIndex("shard")), s"doc $id: dropped doc sharded")
      // a mixture drop means every earlier stage passed AND the draw failed
      if (reason.contains("mixture"))
        assert(bucket(id) >= frac(src) * 65536, s"doc $id")
    }
    // the funnel discriminates: dedup, sampling and at least one
    // quality gate all fire on the planted corpus, and docs survive
    val cnt = rows.flatMap(r => Option(r.getAs[String]("reason")))
      .groupBy(identity).view.mapValues(_.size).toMap
    Seq("exact", "neardup", "mixture").foreach(s =>
      assert(cnt.getOrElse(s, 0) > 0, s"stage $s never fired"))
    assert(Seq("length", "lang", "stopwords", "repetition")
      .exists(cnt.getOrElse(_, 0) > 0), "no quality gate fired")
    assert(rows.exists(_.getBoolean(2)), "nothing survived the funnel")
    // stage ORDER: for original docs the standalone quality gate's
    // reason (same kernel, raw-documents slice of the planted corpus)
    // must be the pipeline's reason whenever it fires — quality is
    // first-failing, no later stage may shadow it
    val gate = graft.operators.TextAnalytics
      .queries("q_quality_gate")(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("reason")))
      .toMap
    TestSpark.housekeeping()
    rows.filter(_.getLong(0) < 100000).foreach { r =>
      gate.get(r.getLong(0)).flatten.foreach { qr =>
        assert(r.getString(r.fieldIndex("reason")) == qr,
          s"doc ${r.getLong(0)}: quality gate must fire first")
      }
    }
  }

  // ---- eval quartet brute-force cross-checks (r9). The operators
  // compute AUC / PR / KS / calibration via grid windows; these tests
  // recompute each metric FROM ITS DEFINITION over an independently
  // re-derived copy of the planted scorer (java.security MD5, not
  // Spark's md5()), so a bug in the grid algebra and a bug in the
  // score plant can't cancel each other out.

  /** Independent re-derivation of Inference.plantedScores:
    * y = [label even], score = y·350000 + (md5(vec_id) first-13-hex
    * mod 1e6)·65 div 100 — plain JVM arithmetic end to end. */
  private lazy val planted: Seq[(Long, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val rows = Tables(spark, TestSpark.sf, "embeddings")
      .select("vec_id", "label").collect()
    TestSpark.housekeeping()
    rows.toSeq.map { r =>
      val hex = md.digest(r.getLong(0).toString
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(b => f"$b%02x").mkString.take(13)
      val u6 = java.lang.Long.parseLong(hex, 16) % 1000000L
      val y = if (r.getInt(1) % 2 == 0) 1L else 0L
      (y, y * 350000L + (u6 * 65L) / 100L)
    }
  }

  private def run(name: String) =
    try graft.operators.Inference.queries(name)(spark, TestSpark.sf).collect()
    finally TestSpark.housekeeping()

  test("q_auc equals the all-pairs Mann-Whitney AUC (ties as half-wins)") {
    val pos = planted.filter(_._1 == 1L).map(_._2)
    val neg = planted.filter(_._1 == 0L).map(_._2)
    // the definition: P(score+ > score-) + P(tie)/2 over ALL pairs
    var wins2 = 0L // doubled win count so ties stay integer
    for (p <- pos; n <- neg)
      wins2 += (if (p > n) 2L else if (p == n) 1L else 0L)
    val brute = wins2.toDouble / (2.0 * pos.size * neg.size)
    val r = run("q_auc").head
    assert(r.getLong(r.fieldIndex("n_pos")) == pos.size.toLong)
    assert(r.getLong(r.fieldIndex("n_neg")) == neg.size.toLong)
    assert(r.getLong(r.fieldIndex("u2")) == wins2,
      "2U from the cumulative grid window must equal the pair count")
    assert(math.abs(r.getDouble(r.fieldIndex("auc")) - brute) < 1e-9)
    // and the planted signal is actually non-degenerate
    assert(brute > 0.7, s"planted AUC degenerate: $brute")
  }

  test("q_ks_test equals the brute-force max CDF gap with lowest-score argmax") {
    val pos = planted.filter(_._1 == 1L).map(_._2)
    val neg = planted.filter(_._1 == 0L).map(_._2)
    val grid = planted.map(_._2).distinct.sorted
    // D at every distinct score, exact integer numerator
    val gaps = grid.map { t =>
      val num = math.abs(pos.count(_ <= t).toLong * neg.size -
        neg.count(_ <= t).toLong * pos.size)
      (num, t)
    }
    val dNum = gaps.map(_._1).max
    val argmax = gaps.filter(_._1 == dNum).map(_._2).min
    val r = run("q_ks_test").head
    assert(r.getLong(r.fieldIndex("d_num")) == dNum)
    assert(r.getLong(r.fieldIndex("ks_score")) == argmax)
    assert(math.abs(r.getDouble(r.fieldIndex("ks_d")) -
      dNum.toDouble / (pos.size.toLong * neg.size)) < 1e-9)
  }

  test("q_pr_curve equals per-threshold brute counts at every operating point") {
    val np = planted.count(_._1 == 1L).toLong
    val rows = run("q_pr_curve").sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == (0L until 10L).map(_ * 100000L))
    rows.foreach { r =>
      val th = r.getLong(r.fieldIndex("th"))
      val tp = planted.count { case (y, s) => y == 1L && s >= th }.toLong
      val fp = planted.count { case (y, s) => y == 0L && s >= th }.toLong
      assert(r.getLong(r.fieldIndex("tp")) == tp, s"th=$th")
      assert(r.getLong(r.fieldIndex("fp")) == fp, s"th=$th")
      assert(r.getLong(r.fieldIndex("fn")) == np - tp, s"th=$th")
      assert(math.abs(r.getDouble(r.fieldIndex("f1")) -
        2.0 * tp / (2.0 * tp + fp + (np - tp))) < 1e-9, s"th=$th")
    }
  }

  test("q_calibration: per-bin confidence/accuracy/gap and ECE equal brute recompute") {
    val byBin = planted.groupBy { case (_, s) => s / 100000L }
    val nTotal = planted.size.toLong
    val rows = run("q_calibration").sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSet == byBin.keySet)
    var ece = BigDecimal(0)
    rows.foreach { r =>
      val bin = r.getLong(r.fieldIndex("bin"))
      val g = byBin(bin)
      val n = g.size.toLong
      val nPos = g.count(_._1 == 1L).toLong
      val sumScore = g.map(_._2).sum
      assert(r.getLong(r.fieldIndex("n")) == n, s"bin=$bin")
      assert(r.getLong(r.fieldIndex("n_pos")) == nPos, s"bin=$bin")
      assert(math.abs(r.getDouble(r.fieldIndex("confidence")) -
        sumScore.toDouble / (n * 1000000L)) < 1e-9, s"bin=$bin")
      assert(math.abs(r.getDouble(r.fieldIndex("accuracy")) -
        nPos.toDouble / n) < 1e-9, s"bin=$bin")
      val gapNum = math.abs(sumScore - nPos * 1000000L)
      assert(math.abs(r.getDouble(r.fieldIndex("gap")) -
        gapNum.toDouble / (n * 1000000L)) < 1e-9, s"bin=$bin")
      ece += BigDecimal(r.getDouble(r.fieldIndex("ece_term")))
    }
    // the headline ECE is the exact sum of the emitted per-bin terms,
    // identical on every row
    rows.foreach { r =>
      assert(math.abs(r.getDouble(r.fieldIndex("ece")) -
        ece.toDouble) < 1e-9)
    }
    // brute ECE from definition: Σ n_b/N · |conf_b − acc_b|, modulo the
    // per-term round-9 the operator documents
    val bruteEce = byBin.values.map { g =>
      val n = g.size.toLong
      val gapNum = math.abs(g.map(_._2).sum - g.count(_._1 == 1L).toLong * 1000000L)
      math.rint(gapNum.toDouble / (nTotal * 1000000L) * 1e9) / 1e9
    }.sum
    assert(math.abs(ece.toDouble - bruteEce) < 1e-8)
  }

  test("q_zonemap_prune: zone maps never false-negative, ratios restate the counts") {
    val rows =
      try graft.operators.Extras
        .queries("q_zonemap_prune")(spark, TestSpark.sf).collect()
      finally TestSpark.housekeeping()
    assert(rows.length == 6, "2 layouts x 3 predicates")
    rows.foreach { r =>
      val nFiles = r.getLong(r.fieldIndex("n_files"))
      val fs = r.getLong(r.fieldIndex("files_scanned"))
      val rs = r.getLong(r.fieldIndex("rows_scanned"))
      val rm = r.getLong(r.fieldIndex("rows_matched"))
      assert(fs >= 0L && fs <= nFiles)
      // THE zone-map contract: pruning may over-read, never under-read
      assert(rs >= rm, s"${r.getString(0)}/${r.getString(1)}: scanned $rs < matched $rm")
      assert(math.abs(r.getDouble(r.fieldIndex("skip_frac")) -
        (1.0 - fs.toDouble / nFiles)) < 1e-9)
      if (rm > 0)
        assert(math.abs(r.getDouble(r.fieldIndex("read_amp")) -
          rs.toDouble / rm) < 1e-9)
    }
    // row-match truth is layout-independent
    rows.groupBy(_.getString(1)).values.foreach { g =>
      assert(g.map(_.getLong(g.head.fieldIndex("rows_matched"))).distinct.size == 1)
    }
    // and the z-order layout must actually beat ingestion order on the
    // non-clustered dim — otherwise the audit is vacuous on testdata
    val byKey = rows.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(byKey(("zorder", "a_8_15")).getLong(3) <
      byKey(("naive", "a_8_15")).getLong(3),
      "z-order should scan fewer files than ingestion order for the a-predicate")
  }

  test("q_ndcg equals a brute NDCG from an independently re-derived BM25 ranking") {
    // independent scorer: plain Scala BM25 with the operator's
    // constants and the same round-9 DECIMAL-sum discipline
    val docs =
      try Tables(spark, TestSpark.sf, "documents").select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1).toLowerCase.split(" ", -1).toSeq))
      finally TestSpark.housekeeping()
    val n = docs.size.toDouble
    val sumDl = docs.map(_._2.size.toLong).sum.toDouble
    def score(terms: Seq[String])(toks: Seq[String]): (Int, Double) = {
      val dl = toks.size.toDouble
      val avgdl = sumDl / n
      val s = terms.map { t =>
        val df = docs.count(_._2.contains(t)).toDouble
        val tf = toks.count(_ == t).toDouble
        val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        val satur = tf * 2.2 / (tf + 1.2 * (0.25 + dl * 0.75 / avgdl))
        BigDecimal(math.rint(idf * satur * 1e9) / 1e9)
      }.sum.toDouble
      (terms.count(toks.contains), s)
    }
    val discounts = (1 to 10).map(i =>
      math.rint(1e9 / (math.log(i + 1.0) / math.log(2.0))) / 1e9)
    val rows =
      try graft.operators.TextAnalytics
        .queries("q_ndcg")(spark, TestSpark.sf).collect()
      finally TestSpark.housekeeping()
    val queries = Seq(Seq("dup", "vector"), Seq("join", "window"), Seq("dup", "query"))
    rows.zip(queries).foreach { case (r, terms) =>
      val graded = docs.map { case (id, toks) =>
        val (g, s) = score(terms)(toks); (id, g, s)
      }
      // ranking with the operator's total order (score desc, id asc)
      val ranked = graded.sortBy { case (id, _, s) => (-s, id) }
      val dcg = ranked.take(10).zip(discounts)
        .map { case ((_, g, _), d) => BigDecimal(math.rint(g * d * 1e9) / 1e9) }.sum
      // sorted-ideal DCG — must equal the operator's histogram form
      val ideal = graded.map(_._2).sorted.reverse.take(10).zip(discounts)
        .map { case (g, d) => BigDecimal(math.rint(g * d * 1e9) / 1e9) }.sum
      assert(r.getLong(r.fieldIndex("cnt2")) == graded.count(_._2 == 2).toLong)
      assert(r.getLong(r.fieldIndex("cnt1")) == graded.count(_._2 == 1).toLong)
      assert(math.abs(r.getDouble(r.fieldIndex("dcg_10")) - dcg.toDouble) < 1e-6)
      assert(math.abs(r.getDouble(r.fieldIndex("idcg_10")) - ideal.toDouble) < 1e-6,
        "histogram IDCG must equal the sorted-ideal DCG")
      if (ideal > 0)
        assert(math.abs(r.getDouble(r.fieldIndex("ndcg_10")) -
          dcg.toDouble / ideal.toDouble) < 1e-6)
    }
  }

  test("q_dedup_incremental: verdicts agree with the standalone exact/minhash operators") {
    def run(name: String) =
      try graft.operators.Dedup.queries(name)(spark, TestSpark.sf).collect()
      finally TestSpark.housekeeping()
    val inc = run("q_dedup_incremental")
    assert(inc.nonEmpty)
    // brute corpus reconstruction (the oracle's corpus rule) for the
    // exact path: text -> all ids, split by the arriving-batch rule
    val docs =
      try Tables(spark, TestSpark.sf, "documents")
        .select("doc_id", "text").collect()
      finally TestSpark.housekeeping()
    val corpus = docs.flatMap { r =>
      val id = r.getLong(0); val t = r.getString(1)
      Seq((id, t)) ++
        (if (id % 10 == 0) Seq((id + 100000L, t)) else Nil) ++
        (if (id % 10 == 1)
          Seq((id + 200000L, t.toLowerCase.split(" ", -1).drop(1).mkString(" ")))
        else Nil)
    }
    val idxByText = corpus.filter(_._1 % 7 != 3).groupBy(_._2)
      .map { case (t, xs) => t -> xs.map(_._1).min }
    val newDocs = corpus.filter(_._1 % 7 == 3).toMap
    assert(inc.map(_.getLong(0)).toSet == newDocs.keySet,
      "exactly one verdict per arriving doc")
    inc.foreach { r =>
      val id = r.getLong(0)
      val expected = idxByText.get(newDocs(id))
      r.getString(1) match {
        case "exact_dup" =>
          assert(expected.contains(r.getLong(2)), s"doc $id exact partner")
          assert(r.isNullAt(3), "exact verdicts carry no jaccard")
        case v =>
          assert(expected.isEmpty, s"doc $id should be exact_dup, was $v")
      }
    }
    // near verdicts must be a subset of the standalone minhash pairs,
    // with the identical jaccard (shared kernel, shared threshold)
    val mh = run("q_dedup_minhash")
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    inc.filter(_.getString(1) == "near_dup").foreach { r =>
      val (n, i) = (r.getLong(0), r.getLong(2))
      val key = (math.min(n, i), math.max(n, i))
      assert(mh.contains(key), s"near pair $key missing from q_dedup_minhash")
      assert(math.abs(mh(key) - r.getDouble(3)) < 1e-12, s"jaccard differs for $key")
    }
    // non-degenerate: all three verdicts appear on testdata
    assert(inc.map(_.getString(1)).toSet == Set("exact_dup", "near_dup", "unique"))
  }

  test("q_containment_dedup equals a brute shingle-set recompute; excerpts caught") {
    val out =
      try graft.operators.Dedup.queries("q_containment_dedup")(spark, TestSpark.sf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getString(4)))
        .toSet
      finally TestSpark.housekeeping()
    assert(out.nonEmpty)
    // independent corpus + shingle + cap + pair recompute (collect-based,
    // plain Scala sets — no shared kernel code)
    val docs =
      try Tables(spark, TestSpark.sf, "documents")
        .select("doc_id", "source", "text").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      finally TestSpark.housekeeping()
    def prefix40(t: String): String = {
      val w = t.split(" ", -1)
      w.take(math.max(1, w.length * 2 / 5)).mkString(" ")
    }
    def lowerDropFirst(t: String): String =
      t.toLowerCase(java.util.Locale.ROOT).split(" ", -1).drop(1).mkString(" ")
    val corpus = docs.flatMap { case (id, src, t) =>
      Seq((id, src, t)) ++
        (if (id % 10 == 0) Seq((id + 100000L, src, t)) else Nil) ++
        (if (id % 10 == 1) Seq((id + 200000L, src, lowerDropFirst(t))) else Nil) ++
        (if (id % 13 == 2) Seq((id + 300000L, src, prefix40(t))) else Nil)
    }
    def sh3(t: String): Set[String] = {
      val w = t.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
      val k = math.max(w.length - 2, 1)
      (0 until k).map(i => w.slice(i, math.min(i + 3, w.length)).mkString(" ")).toSet
    }
    val shOf = corpus.map { case (id, src, t) => (id, src) -> sh3(t) }.toMap
    val df = corpus.flatMap { case (id, src, t) => sh3(t).map((src, _)) }
      .groupBy(identity).map { case (k, v) => k -> v.size }
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val brute = (for {
      Seq((ida, srca, _), (idb, srcb, _)) <- corpus.sortBy(_._1).toSeq.combinations(2)
      if srca == srcb
      sa = shOf((ida, srca)); sb = shOf((idb, srcb))
      c = sa.intersect(sb).count(s => df((srca, s)) <= 1000)
      if c > 0
      j = r9(c.toDouble / (sa.size + sb.size - c))
      ca = c.toDouble / sa.size; cb = c.toDouble / sb.size
      cont = r9(math.max(ca, cb))
      if cont >= 0.9 && j < 0.6
    } yield (ida, idb, j, cont, if (ca >= cb) "a_in_b" else "b_in_a")).toSet
    assert(out == brute, s"operator ${out.size} rows vs brute ${brute.size}")
    // the planted failure mode is actually caught: excerpt tiers appear
    // with the excerpt named as the contained side
    val planted = out.filter { case (a, b, _, _, _) => b == a + 300000L }
    assert(planted.nonEmpty, "no planted excerpt pair detected")
    planted.foreach { case (_, _, j, cont, dir) =>
      assert(dir == "b_in_a", "excerpt must be the contained side")
      assert(cont >= 0.9 && j < 0.6)
    }
  }

  test("q_knn_classify equals a brute 5-NN majority vote; mass = eval count") {
    val out =
      try graft.operators.Similarity.queries("q_knn_classify")(spark, TestSpark.sf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      finally TestSpark.housekeeping()
    val vecs =
      try Tables(spark, TestSpark.sf, "embeddings").collect()
        .map(r => (r.getLong(0),
          r.getSeq[Float](1).map(_.toDouble).toArray,
          r.getInt(2).toLong))
      finally TestSpark.housekeeping()
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val train = vecs.filter(_._1 % 2 == 0)
    val eval = vecs.filter(_._1 % 2 == 1)
    val brute = eval.map { case (_, qv, qlab) =>
      val qn = math.sqrt(dot(qv, qv))
      val top5 = train
        .map { case (nid, nv, nlab) =>
          (r9(dot(qv, nv) / (qn * math.sqrt(dot(nv, nv)))), nid, nlab) }
        .sortBy { case (sim, nid, _) => (-sim, nid) }.take(5)
      val pred = top5.groupBy(_._3).toSeq
        .map { case (lab, xs) => (xs.length, lab) }
        .sortBy { case (cnt, lab) => (-cnt, lab) }.head._2
      (qlab, pred)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(out == brute)
    assert(out.values.sum == eval.length.toLong,
      "confusion mass must equal the eval-half count")
  }

  test("q_label_propagation equals a brute 3-round synchronous LPA roll-up") {
    val out =
      try graft.operators.Analytic.queries("q_label_propagation")(spark, TestSpark.sf)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      finally TestSpark.housekeeping()
    assert(out.nonEmpty)
    val custOf =
      try Tables(spark, TestSpark.sf, "orders")
        .select("o_orderkey", "o_custkey").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally TestSpark.housekeeping()
    val e0 =
      try Tables(spark, TestSpark.sf, "lineitem")
        .select("l_orderkey", "l_suppkey").collect()
        .flatMap(r => custOf.get(r.getLong(0)).map(c => (c * 2, r.getLong(1) * 2 + 1)))
        .distinct
      finally TestSpark.housekeeping()
    val edges = e0 ++ e0.map { case (s, d) => (d, s) }
    val adj = edges.groupBy(_._2).map { case (dst, es) => dst -> es.map(_._1) }
    var lab: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3)
      lab = adj.map { case (node, nbrs) =>
        node -> nbrs.map(lab).groupBy(identity).toSeq
          .map { case (l, xs) => (xs.length, l) }
          .sortBy { case (cnt, l) => (-cnt, l) }.head._2
      }
    val brute = lab.groupBy(_._2).map { case (l, members) =>
      val nodes = members.keys.toSeq
      (if (l % 2 == 0) s"c${l / 2}" else s"s${l / 2}",
        nodes.size.toLong,
        nodes.count(_ % 2 == 0).toLong,
        nodes.count(_ % 2 == 1).toLong)
    }.toSeq.sortBy { case (comm, n, _, _) => (-n, comm) }.take(25)
    assert(out == brute)
    // roll-up internal consistency: member mix partitions each community
    out.foreach { case (_, n, nc, ns) => assert(nc + ns == n) }
  }

  test("q_skew_audit: quantile ordering and conservation on real keys") {
    val rows =
      try graft.operators.Extras.queries("q_skew_audit")(
        spark, TestSpark.sf).collect()
      finally TestSpark.housekeeping()
    assert(rows.length == 4)
    rows.foreach { r =>
      val (nRows, nKeys, maxC, medC, p99C) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(medC <= p99C && p99C <= maxC && maxC <= nRows)
      assert(nKeys <= nRows)
      assert(r.getDouble(6) ==
        BigDecimal(maxC.toDouble / nRows)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      // avg key weight >= 1 ⇒ skew_factor (max/avg) <= max_cnt
      assert(r.getDouble(7) >= 1.0 - 1e-6 && r.getDouble(7) <= maxC)
    }
  }

  test("skewLeg: a planted 90%-hot key fires the capped salt branch") {
    import spark.implicits._
    // 900 rows of key 0 + 100 distinct singleton keys: n_keys=101,
    // max=900, skew = 900*101/1000 = 90.9 -> ceil capped at 32
    val df = (Seq.fill(900)(0L) ++ (1L to 100L)).toDF("k")
      .repartition(7)
    val r =
      try graft.operators.Extras.skewLeg(df, "planted.k",
        org.apache.spark.sql.functions.col("k")).collect().head
      finally TestSpark.housekeeping()
    assert(r.getLong(1) == 1000L && r.getLong(2) == 101L)
    assert(r.getLong(3) == 900L)
    assert(r.getLong(4) == 1L, "lower median of 101 counts is 1")
    // ceil(0.99*101) = 100 and 100 of the 101 keys are singletons —
    // even an extreme hot key hides from p99; max_cnt is the tell
    assert(r.getLong(5) == 1L)
    assert(r.getDouble(7) == 90.9)
    assert(r.getLong(8) == 32L, "salt recommendation must cap at 32")
  }

  test("q_conformal equals the brute split-conformal recompute") {
    // independent re-derivation incl. the split bucket (md5 chars
    // 17-20), so grid-algebra and plant bugs can't cancel
    val md = java.security.MessageDigest.getInstance("MD5")
    val rows = Tables(spark, TestSpark.sf, "embeddings")
      .select("vec_id", "label").collect()
    TestSpark.housekeeping()
    val pts = rows.toSeq.map { r =>
      val hex = md.digest(r.getLong(0).toString
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(b => f"$b%02x").mkString
      val u6 = java.lang.Long.parseLong(hex.take(13), 16) % 1000000L
      val y = if (r.getInt(1) % 2 == 0) 1L else 0L
      (y, y * 350000L + (u6 * 65L) / 100L,
        java.lang.Long.parseLong(hex.substring(16, 20), 16))
    }
    val cal = pts.filter(_._3 < 32768L)
      .map { case (y, s, _) => if (y == 1L) 1000000L - s else s }.sorted
    val k = (9 * (cal.size + 1) + 9) / 10 // ceil(0.9·(n_cal+1))
    val qHat = if (k <= cal.size) cal(k - 1) else 1000000L
    val ev = pts.filter(_._3 >= 32768L)
    val covered = ev.count { case (y, s, _) =>
      if (y == 1L) 1000000L - s <= qHat else s <= qHat }
    val cells = ev.map { case (_, s, _) =>
      (if (1000000L - s <= qHat) 1 else 0) +
        (if (s <= qHat) 1 else 0) }.sum
    val r = run("q_conformal").head
    assert(r.getLong(r.fieldIndex("n_cal")) == cal.size.toLong)
    assert(r.getLong(r.fieldIndex("n_eval")) == ev.size.toLong)
    assert(r.getLong(r.fieldIndex("q_hat")) == qHat,
      "grid order statistic must equal the sorted calibration pick")
    assert(math.abs(r.getDouble(r.fieldIndex("coverage")) -
      covered.toDouble / ev.size) < 1e-9)
    assert(math.abs(r.getDouble(r.fieldIndex("avg_set_size")) -
      cells.toDouble / ev.size) < 1e-9)
    // the planted fixture's realization is non-degenerate: near-target
    // coverage with informative (not all-label) prediction sets
    assert(r.getDouble(r.fieldIndex("coverage")) > 0.8)
    assert(r.getDouble(r.fieldIndex("avg_set_size")) >= 1.0 &&
      r.getDouble(r.fieldIndex("avg_set_size")) < 2.0)
  }

  test("q_burst_detect: z equals brute per-type moments, sums to ~0") {
    val rows =
      try graft.operators.Analytic.queries("q_burst_detect")(
        spark, TestSpark.sf).collect()
      finally TestSpark.housekeeping()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    // the grid is rectangular: every type covers every day
    assert(byType.values.map(_.length).toSet.size == 1)
    byType.foreach { case (t, rs) =>
      val nd = rs.length.toLong
      val s1 = rs.map(_.getLong(2)).sum
      val s2 = rs.map(r => r.getLong(2) * r.getLong(2)).sum
      val varNum = nd * s2 - s1 * s1
      var zSum = 0.0
      rs.foreach { r =>
        if (varNum > 0) {
          val expect = BigDecimal((nd * r.getLong(2) - s1).toDouble /
            math.sqrt(varNum.toDouble))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(r.getDouble(3) == expect, s"$t day=${r.getLong(1)}")
          assert(r.getBoolean(4) == (r.getDouble(3) >= 2.0))
          zSum += r.getDouble(3)
        } else assert(r.isNullAt(3) && !r.getBoolean(4))
      }
      // Σ(nd·c − Σc) = 0 exactly; only round-9 residue survives
      assert(math.abs(zSum) <= nd * 5e-10, s"$t zSum=$zSum")
    }
  }

  test("q_temporal_split: conservation, cut ordering, leakage bounds") {
    val (r, total) =
      try {
        val row = graft.operators.Extras.queries("q_temporal_split")(
          spark, TestSpark.sf).collect().head
        (row, Tables(spark, TestSpark.sf, "events").count())
      } finally TestSpark.housekeeping()
    val (t1, t2) = (r.getLong(0), r.getLong(1))
    assert(t1 < t2, "embargo must be a real gap")
    val (nTr, nEm, nTe) = (r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nTr + nEm + nTe == total, "splits must partition the corpus")
    assert(nTr > 0L && nTe > 0L, "both model splits populated")
    val (uTr, uTe, uOv) = (r.getLong(5), r.getLong(6), r.getLong(7))
    assert(uOv <= math.min(uTr, uTe))
    val leak = r.getDouble(8)
    assert(leak >= 0.0 && leak <= 1.0)
    assert(leak == BigDecimal(uOv.toDouble / uTe)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("q_ipw_ate: brute strata recompute, deconfounding beats naive") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val raw =
      try Tables(spark, TestSpark.sf, "events")
        .selectExpr("event_id", "(unix_micros(ts) div 3600000000) % 24",
          "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS LONG)").collect()
      finally TestSpark.housekeeping()
    // independent plant re-derivation: JVM md5, plain arithmetic
    val pts = raw.toSeq.map { r =>
      val hex = md.digest(r.getLong(0).toString
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(b => f"$b%02x").mkString.take(4)
      val hour = r.getLong(1)
      val t = if (java.lang.Long.parseLong(hex, 16) < (16 + hour) * 1024)
        1L else 0L
      (hour, t, r.getLong(2) + t * 5000L + hour * 1000L)
    }
    val rows =
      try graft.operators.Inference.queries("q_ipw_ate")(
        spark, TestSpark.sf).collect()
      finally TestSpark.housekeeping()
    val byHour = pts.groupBy(_._1)
    assert(rows.map(_.getLong(0)).toSet == byHour.keySet)
    rows.foreach { r =>
      val g = byHour(r.getLong(0))
      assert(r.getLong(1) == g.size.toLong)
      assert(r.getLong(2) == g.count(_._2 == 1L).toLong,
        s"hour=${r.getLong(0)} treated count")
    }
    // planted effect is +5000 cents; stratified IPW must land closer
    // to it than the confounded naive gap does
    val ate = rows.head.getDouble(rows.head.fieldIndex("ate"))
    val (st, nt) = (pts.filter(_._2 == 1L).map(_._3).sum,
      pts.count(_._2 == 1L).toLong)
    val (sc2, nc) = (pts.filter(_._2 == 0L).map(_._3).sum,
      pts.count(_._2 == 0L).toLong)
    val naive = st.toDouble / nt - sc2.toDouble / nc
    assert(math.abs(ate - 5000.0) < math.abs(naive - 5000.0),
      s"ate=$ate naive=$naive — IPW failed to deconfound")
    assert(math.abs(ate - 5000.0) < 1500.0, s"ate=$ate off-plant")
    // every row broadcasts the same headline
    rows.foreach(r => assert(r.getDouble(r.fieldIndex("ate")) == ate))
  }

  test("q_bandit_ucb: UCB1 formula recompute, rank is a permutation") {
    val rows =
      try graft.operators.Extras.queries("q_bandit_ucb")(
        spark, TestSpark.sf).collect()
      finally TestSpark.housekeeping()
    assert(rows.nonEmpty)
    val nTotal = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      val (n, p) = (r.getLong(1), r.getLong(2))
      assert(p <= n)
      val ucb = BigDecimal(p.toDouble / n +
        math.sqrt(2.0 * math.log(nTotal.toDouble) / n))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(4) == ucb, s"${r.getString(0)}")
    }
    // explore_rank is the (ucb desc, source) permutation
    val ranked = rows.sortBy(r => (-r.getDouble(4), r.getString(0)))
    assert(ranked.map(_.getLong(5)).toSeq == (1L to rows.length))
    // equal-n arms (this corpus) ⇒ equal bonus ⇒ ucb order must
    // degenerate to mean order — the formula's sanity anchor
    if (rows.map(_.getLong(1)).distinct.length == 1)
      assert(ranked.map(_.getDouble(3)).toSeq ==
        ranked.map(_.getDouble(3)).sorted(Ordering[Double].reverse).toSeq)
  }

  test("q_tail_index: thin-tailed synthetic keys are NOT flagged") {
    val rows =
      try graft.operators.Extras.queries("q_tail_index")(
        spark, TestSpark.sf).collect()
      finally TestSpark.housekeeping()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1L && r.getLong(1) <= 50L)
      assert(!r.isNullAt(3) && r.getDouble(3) > 2.0,
        s"${r.getString(0)}: near-uniform keys must read as thin-tailed")
      assert(!r.getBoolean(4))
    }
  }

  test("hillLeg: a planted alpha=1.5 power law is flagged infinite-variance") {
    import org.apache.spark.sql.functions.{col, explode, expr}
    // 60 keys whose counts follow c_r = 2000·r^(-2/3) — a Pareto tail
    // with alpha = 1.5 (finite mean, infinite variance)
    val df = spark.range(1, 61).select(col("id").as("k"),
        expr("CAST(round(2000 * power(CAST(id AS DOUBLE), -2.0/3.0), 0)" +
          " AS LONG)").as("c"))
      .select(col("k"), explode(expr("sequence(1, c)")).as("i"))
    val r =
      try graft.operators.Extras.hillLeg(df, "planted", col("k"))
        .collect().head
      finally TestSpark.housekeeping()
    assert(r.getLong(1) == 50L, "60 keys -> top 51 -> k = 50")
    val alpha = r.getDouble(3)
    assert(alpha > 1.0 && alpha < 2.0, s"alpha=$alpha off the plant")
    assert(r.getBoolean(4), "alpha < 2 must flag infinite variance")
  }

  test("q_wasserstein equals the brute CDF-gap integral per source") {
    val raw =
      try Tables(spark, TestSpark.sf, "documents")
        .select("source", "n_chars").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      finally TestSpark.housekeeping()
    val rows =
      try graft.operators.Analytic.queries("q_wasserstein")(
        spark, TestSpark.sf).collect()
      finally TestSpark.housekeeping()
    assert(rows.map(_.getString(0)).toSet == raw.map(_._1).toSet)
    val grid = raw.map(_._2).distinct.sorted
    val nAll = raw.length.toLong
    rows.foreach { r =>
      val src = r.getString(0)
      val a = raw.filter(_._1 == src).map(_._2)
      val (nA, nB) = (a.length.toLong, nAll - a.length)
      assert(r.getLong(1) == nA && r.getLong(2) == nB)
      // Σ |cumA·nB − cumB·nA|·Δx / (nA·nB), exact integers inside
      var num = BigInt(0)
      grid.zip(grid.tail).foreach { case (x, nx) =>
        val cumA = a.count(_ <= x).toLong
        val cumB = raw.count(p => p._1 != src && p._2 <= x).toLong
        num += BigInt((cumA * nB - cumB * nA).abs) * (nx - x)
      }
      val expect = BigDecimal(num.toDouble / (nA.toDouble * nB))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == expect, s"$src")
      assert(r.getDouble(3) >= 0.0)
    }
    // the audit must be non-degenerate: sources differ in length mix
    assert(rows.map(_.getDouble(3)).max > 0.0)
  }

  test("q_cross_corr: brute Pearson per lag, pair-count conservation") {
    val raw =
      try Tables(spark, TestSpark.sf, "events")
        .selectExpr("unix_micros(ts) div 86400000000", "event_type")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      finally TestSpark.housekeeping()
    val byDay = raw.groupBy(_._1).map { case (day, es) =>
      day -> (es.count(_._2 == "click").toLong,
        es.count(_._2 == "purchase").toLong) }
    val rows =
      try graft.operators.Analytic.queries("q_cross_corr")(
        spark, TestSpark.sf).collect()
      finally TestSpark.housekeeping()
    assert(rows.map(_.getLong(0)).toSeq == (-3L to 3L))
    val rsByLag = rows.map { r =>
      val lag = r.getLong(0)
      val pairs = byDay.keys.toSeq.flatMap(day =>
        byDay.get(day + lag).map(y => (byDay(day)._1, y._2)))
      assert(r.getLong(1) == pairs.length.toLong, s"lag=$lag pairs")
      val n = pairs.length.toLong
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val (vx, vy) = (n * sxx - sx * sx, n * syy - sy * sy)
      if (vx > 0 && vy > 0) {
        val expect = BigDecimal((n * sxy - sx * sy).toDouble /
          math.sqrt((vx * vy).toDouble))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getDouble(2) == expect, s"lag=$lag")
        assert(math.abs(r.getDouble(2)) <= 1.0)
      } else assert(r.isNullAt(2))
      (lag, r.getDouble(2))
    }
    // best_lag is the |r| argmax (smallest lag on ties), on every row
    val best = rsByLag.maxBy { case (l, r) => (math.abs(r), -l) }._1
    rows.foreach(r => assert(r.getLong(3) == best))
  }

  test("q_mad_anomaly: brute median/MAD/Hampel recompute per type") {
    val raw =
      try Tables(spark, TestSpark.sf, "events")
        .selectExpr("event_type",
          "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS LONG)").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      finally TestSpark.housekeeping()
    val rows =
      try graft.operators.Analytic.queries("q_mad_anomaly")(
        spark, TestSpark.sf).collect()
      finally TestSpark.housekeeping()
    assert(rows.map(_.getString(0)).toSet == raw.map(_._1).toSet)
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s((s.length - 1) / 2) // min v with 2·cum >= n
    }
    rows.foreach { r =>
      val vs = raw.filter(_._1 == r.getString(0)).map(_._2)
      val med = lowerMedian(vs)
      val mad = lowerMedian(vs.map(v => math.abs(v - med)))
      assert(r.getLong(1) == vs.length.toLong)
      assert(r.getLong(2) == med, s"${r.getString(0)} median")
      assert(r.getLong(3) == mad, s"${r.getString(0)} mad")
      val nAnom = vs.count(v => math.abs(v - med) * 10000L > mad * 44478L)
      assert(r.getLong(4) == nAnom.toLong)
      // robustness sanity: the rule flags a minority tail, not half
      assert(r.getDouble(5) < 0.25)
    }
  }

  test("q_join_card: exact truth equals the brute grid product sum") {
    def keysOf(t: String, k: String): Seq[Long] =
      try Tables(spark, TestSpark.sf, t)
        .selectExpr(s"CAST($k AS LONG)").collect().map(_.getLong(0)).toSeq
      finally TestSpark.housekeeping()
    val legs = Map(
      "lineitem*part" -> (keysOf("lineitem", "l_partkey"),
        keysOf("part", "p_partkey")),
      "lineitem*supplier" -> (keysOf("lineitem", "l_suppkey"),
        keysOf("supplier", "s_suppkey")),
      "orders*customer" -> (keysOf("orders", "o_custkey"),
        keysOf("customer", "c_custkey")),
      "events*events" -> (keysOf("events", "user_id"),
        keysOf("events", "user_id")))
    val rows =
      try graft.operators.Extras.queries("q_join_card")(
        spark, TestSpark.sf).collect()
      finally TestSpark.housekeeping()
    assert(rows.map(_.getString(0)).toSet == legs.keySet)
    rows.foreach { r =>
      val (a, b) = legs(r.getString(0))
      val (ca, cb) = (a.groupBy(identity).view.mapValues(_.size.toLong),
        b.groupBy(identity).view.mapValues(_.size.toLong))
      assert(r.getLong(1) == a.size.toLong && r.getLong(2) == b.size.toLong)
      assert(r.getLong(3) == ca.size.toLong && r.getLong(4) == cb.size.toLong)
      val truth = ca.keys.toSeq.map(k =>
        ca(k) * cb.getOrElse(k, 0L)).sum
      assert(r.getLong(6) == truth, s"${r.getString(0)} truth")
      val est = a.size.toLong * b.size.toLong /
        math.max(ca.size.toLong, cb.size.toLong)
      assert(r.getLong(5) == est, s"${r.getString(0)} estimate")
      // self-join truth is Sigma c^2 >= n^2/d — uniformity UNDERestimates
      // under any skew (Cauchy-Schwarz); est can never exceed truth here
      if (r.getString(0) == "events*events")
        assert(r.getLong(5) <= r.getLong(6))
    }
  }

  test("q_dp_topk equals the brute hash-Gumbel mechanism sample") {
    val docs =
      try Tables(spark, TestSpark.sf, "documents")
        .select("text").collect().map(_.getString(0))
      finally TestSpark.housekeeping()
    val freq = docs.flatMap(_.toLowerCase.split(" ", -1))
      .filter(_.nonEmpty).groupBy(identity)
      .map { case (w, xs) => (w, xs.length.toLong) }
    val md = java.security.MessageDigest.getInstance("MD5")
    val keyed = freq.toSeq.map { case (w, f) =>
      val hex = md.digest(w.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
        .map(b => f"$b%02x").mkString.take(13)
      val u = (java.lang.Long.parseLong(hex, 16) + 1.0) /
        4503599627370497.0
      val key = BigDecimal(0.05 * f - math.log(-math.log(u)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      (w, f, key)
    }
    val expect = keyed.sortBy { case (w, _, k) => (-k, w) }.take(10)
    val ordered = freq.toSeq.sortBy { case (w, f) => (-f, w) }
    val rows =
      try graft.operators.TextAnalytics.queries("q_dp_topk")(
        spark, TestSpark.sf).collect()
      finally TestSpark.housekeeping()
    assert(rows.length == 10)
    rows.zip(expect).foreach { case (r, (w, f, _)) =>
      assert(r.getString(1) == w && r.getLong(2) == f,
        s"rank ${r.getLong(0)}")
      assert(r.getLong(3) == ordered.indexWhere(_._1 == w) + 1L,
        s"true_rank of $w")
    }
    // utility at this epsilon: the release draws from the frequency
    // HEAD (every true rank well inside the vocab), noise permitting
    // reorderings — not the exact top-10 and not tail words
    assert(rows.map(_.getLong(3)).max <= 100L)
  }

  test("q_hash_ring equals the brute ring walk; ring beats mod") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(x: String): Long = java.lang.Long.parseLong(
      md.digest(x.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(b => f"$b%02x").mkString.take(13), 16)
    def ring(n: Int): Seq[(Long, Long)] = (for {
      s <- 0L until n.toLong; v <- 0L until 8L
    } yield (h(s"shard$s#$v"), s)).sortBy(identity)
    val (r32, r33) = (ring(32), ring(33))
    def shardOf(r: Seq[(Long, Long)], kh: Long): Long =
      r.find(_._1 >= kh).getOrElse(r.head)._2
    val ids =
      try Tables(spark, TestSpark.sf, "documents")
        .select("doc_id").collect().map(_.getLong(0))
      finally TestSpark.housekeeping()
    val ringMoved = ids.count { id =>
      val kh = h(id.toString)
      shardOf(r32, kh) != shardOf(r33, kh)
    }
    val modMoved = ids.count(id => id % 32 != id % 33)
    val rows =
      try graft.operators.Extras.queries("q_hash_ring")(
        spark, TestSpark.sf).collect()
      finally TestSpark.housekeeping()
    val byStrat = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    assert(byStrat("ring_vnodes") == (ids.length.toLong, ringMoved.toLong))
    assert(byStrat("mod_n") == (ids.length.toLong, modMoved.toLong))
    // the whole point: consistent hashing relocates a sliver, mod
    // relocates nearly everything
    assert(ringMoved * 5 < ids.length, "ring must move < 20% of keys")
    assert(modMoved * 2 > ids.length, "mod must move > 50% of keys")
  }

  test("q_srm: brute two-grain chi-square; balanced coin stays green") {
    val raw =
      try Tables(spark, TestSpark.sf, "events")
        .select("user_id").collect().map(_.getLong(0))
      finally TestSpark.housekeeping()
    val rows =
      try graft.operators.Inference.queries("q_srm")(
        spark, TestSpark.sf).collect()
      finally TestSpark.housekeeping()
    assert(rows.map(_.getString(0)).toSeq.sorted.toSeq ==
      Seq("events", "users"))
    rows.foreach { r =>
      val (a, b) = r.getString(0) match {
        case "events" => (raw.count(_ % 2 == 0).toLong,
          raw.count(_ % 2 == 1).toLong)
        case _ => (raw.distinct.count(_ % 2 == 0).toLong,
          raw.distinct.count(_ % 2 == 1).toLong)
      }
      assert(r.getLong(1) == a && r.getLong(2) == b)
      val chi2 = BigDecimal((a - b).toDouble * (a - b) / (a + b))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == chi2)
      assert(r.getBoolean(4) == (chi2 > 3.841459))
    }
    // the UNIT-grain coin is fair by construction (user_id % 2), so
    // users must stay green; the EVENTS grain is free to fire — and
    // at this SF it does (562/438), the activity-correlated imbalance
    // signature the two-grain design exists to separate
    assert(!rows.find(_.getString(0) == "users").get.getBoolean(4),
      "a fair unit coin must not trip unit-grain SRM")
  }

  test("q_did recovers the planted +3000-cent post-treated lift") {
    val raw =
      try Tables(spark, TestSpark.sf, "events")
        .filter(org.apache.spark.sql.functions.col("event_type") ===
          "purchase")
        .selectExpr("user_id % 2", "unix_micros(ts)",
          "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS LONG)")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      finally TestSpark.housekeeping()
    val (lo, hi) = (raw.map(_._2).min, raw.map(_._2).max)
    val cells = raw.map { case (t, us, c) =>
      val post = if (us * 2 > lo + hi) 1L else 0L
      (t, post, c + (if (t == 1L && post == 1L) 3000L else 0L))
    }
    def mean(t: Long, p: Long): Double = {
      val g = cells.filter(x => x._1 == t && x._2 == p).map(_._3)
      g.sum.toDouble / g.length
    }
    val r =
      try graft.operators.Inference.queries("q_did")(
        spark, TestSpark.sf).collect().head
      finally TestSpark.housekeeping()
    Seq((1L, 1L, 0), (1L, 0L, 1), (0L, 1L, 2), (0L, 0L, 3)).foreach {
      case (t, p, i) => assert(r.getLong(i) ==
        cells.count(x => x._1 == t && x._2 == p).toLong)
    }
    val did = r.getDouble(6)
    val expect = BigDecimal((mean(1, 1) - mean(1, 0)) -
      (mean(0, 1) - mean(0, 0)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(did == expect)
    // the estimator must land near the plant (means of ~1000-row
    // cells with ~10000-cent spread → s.e. a few hundred cents)
    assert(math.abs(did - 3000.0) < 1500.0, s"did=$did off-plant")
  }

  test("q_sax_words: brute symbolization in day order; histogram folds") {
    val raw =
      try Tables(spark, TestSpark.sf, "events")
        .selectExpr("event_type", "unix_micros(ts) div 86400000000")
        .collect().map(r => (r.getString(0), r.getLong(1)))
      finally TestSpark.housekeeping()
    val types = raw.map(_._1).distinct
    val days = raw.map(_._2).distinct.sorted
    val rows =
      try graft.operators.Analytic.queries("q_sax_words")(
        spark, TestSpark.sf).collect()
      finally TestSpark.housekeeping()
    assert(rows.map(_.getString(0)).toSet == types.toSet)
    rows.foreach { r =>
      val t = r.getString(0)
      val cnts = days.map(day =>
        raw.count(p => p._1 == t && p._2 == day).toLong)
      val nd = cnts.length.toLong
      val (s1, s2) = (cnts.sum, cnts.map(x => x * x).sum)
      val varNum = nd * s2 - s1 * s1
      val word = cnts.map { c =>
        if (varNum <= 0) "b" else {
          val z = BigDecimal((nd * c - s1).toDouble /
            math.sqrt(varNum.toDouble))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
          if (z < -0.6745) "a" else if (z < 0.0) "b"
          else if (z < 0.6745) "c" else "d"
        }
      }.mkString
      assert(r.getLong(1) == nd)
      assert(r.getString(2) == word, s"$t word")
      Seq("a", "b", "c", "d").zipWithIndex.foreach { case (sym, i) =>
        assert(r.getLong(3 + i) == word.count(_.toString == sym).toLong)
      }
      assert(r.getString(2).length == nd)
    }
  }

  test("q_bm25_incremental: merged index+batch stats equal whole-corpus stats; scores match q_bm25's kernel") {
    import org.apache.spark.sql.functions._
    // the merge property, checked on exact longs (the mergeable-stats
    // contract the admission path depends on)
    val docs =
      try Tables(spark, TestSpark.sf, "documents")
        .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
      finally TestSpark.housekeeping()
    val terms = Seq("dup", "vector", "query")
    def stats(xs: Array[(Long, Seq[String])]) =
      (xs.length.toLong, xs.map(_._2.length.toLong).sum,
        terms.map(t => xs.count(_._2.contains(t)).toLong))
    val (ni, si, di) = stats(docs.filter(_._1 % 7 != 3))
    val (nb, sb, db) = stats(docs.filter(_._1 % 7 == 3))
    val (nf, sf, df) = stats(docs)
    assert(ni + nb == nf && si + sb == sf &&
      di.zip(db).map { case (a, b) => a + b } == df)
    // and the admitted batch's scores are exactly the whole-corpus
    // kernel's scores for those docs (corpus = index ∪ batch)
    val inc =
      try graft.operators.TextAnalytics.queries("q_bm25_incremental")(
        spark, TestSpark.sf).collect()
        .map(r => r.getLong(0) -> r.getDouble(4)).toMap
      finally TestSpark.housekeeping()
    assert(inc.nonEmpty && inc.keySet.forall(_ % 7 == 3))
    val full =
      try graft.operators.TextAnalytics.queries("q_bm25")(
        spark, TestSpark.sf).collect()
        .map(r => r.getLong(0) -> r.getDouble(4)).toMap
      finally TestSpark.housekeeping()
    val overlap = inc.keySet.intersect(full.keySet)
    assert(overlap.forall(k => inc(k) == full(k)),
      "incremental scores diverge from the whole-corpus kernel")
  }

  test("q_ann_hubness: k-occurrence surface is genuinely skewed and conserved") {
    val rows =
      try graft.operators.Similarity.queries("q_ann_hubness")(
        spark, TestSpark.sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      finally TestSpark.housekeeping()
    assert(rows.length == 20)
    // ordered by (k_occ desc, vec_id)
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1) })
    // hubs genuinely over-occur: the top hub is well above the mean
    // (ratio 1.0), the audit's whole point
    assert(rows.head._3 > 1.5, s"no hub structure: top ratio ${rows.head._3}")
    // k_occ and ratio agree in ordering (ratio is a monotone rescale)
    assert(rows.map(_._3).sliding(2).forall {
      case Array(ra, rb) => ra >= rb })
  }

  test("q_embedding_pipeline: stage attribution is consistent, ordered, and non-vacuous") {
    import org.apache.spark.sql.functions._
    val rows =
      try graft.operators.Similarity.queries("q_embedding_pipeline")(
        spark, TestSpark.sf).collect()
      finally TestSpark.housekeeping()
    val n = Tables(spark, TestSpark.sf, "embeddings").count()
    val nPert = Tables(spark, TestSpark.sf, "embeddings")
      .filter(col("vec_id") % 20 === 0).count()
    // conservation: one verdict per corpus row
    assert(rows.length.toLong == n + nPert)
    val byReason = rows.groupBy(r =>
      if (r.isNullAt(2)) "kept" else r.getString(2)).view.mapValues(_.length)
    // every stage fires on this fixture — none of the gates is vacuous
    Seq("degenerate", "semantic_dup", "balance", "kept").foreach { s =>
      assert(byReason.getOrElse(s, 0) > 0, s"stage '$s' never fired: $byReason")
    }
    rows.foreach { r =>
      val keep = r.getBoolean(1)
      val reason = if (r.isNullAt(2)) null else r.getString(2)
      assert(keep == (reason == null))
      // degenerate rows never reached the cluster assignment; all
      // later verdicts carry their list id
      if (reason == "degenerate") assert(r.isNullAt(3))
      else assert(!r.isNullAt(3))
      // shard only on kept rows
      assert(keep != r.isNullAt(4))
      if (keep) assert(r.getLong(4) >= 0 && r.getLong(4) < 32)
      // the zero-plant is exactly the degenerate set
      assert((r.getLong(0) % 41 == 7) == (reason == "degenerate"))
    }
  }

  test("q_langid_eval re-derives from the gated q_lang_id rows (one classifier, two readers)") {
    val preds =
      try graft.operators.TextAnalytics.queries("q_lang_id")(
        spark, TestSpark.sf).collect()
        .map(r => (r.getString(1), r.getString(6)))
      finally TestSpark.housekeeping()
    def r9(v: Double) = BigDecimal(v)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val langs = (preds.map(_._1) ++ preds.map(_._2)).distinct.sorted
    val expected = langs.map { l =>
      val nT = preds.count(_._1 == l).toLong
      val nP = preds.count(_._2 == l).toLong
      val tp = preds.count(x => x._1 == l && x._2 == l).toLong
      (l, nT, nP, tp,
        if (nP > 0) java.lang.Double.valueOf(r9(tp.toDouble / nP)) else null,
        if (nT > 0) java.lang.Double.valueOf(r9(tp.toDouble / nT)) else null,
        if (nT + nP > 0)
          java.lang.Double.valueOf(r9(2.0 * tp / (nT + nP))) else null)
    }.toSeq
    val actual =
      try graft.operators.TextAnalytics.queries("q_langid_eval")(
        spark, TestSpark.sf).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) null else java.lang.Double.valueOf(r.getDouble(4)),
          if (r.isNullAt(5)) null else java.lang.Double.valueOf(r.getDouble(5)),
          if (r.isNullAt(6)) null else java.lang.Double.valueOf(r.getDouble(6))))
        .toSeq
      finally TestSpark.housekeeping()
    assert(actual == expected,
      s"first diff: ${actual.zip(expected).find { case (a, b) => a != b }}")
    // non-degenerate: the heuristic is imperfect but far above chance
    val f1s = actual.flatMap(r => Option(r._7).map(_.doubleValue()))
    assert(f1s.exists(f => f > 0.3 && f < 1.0),
      s"language-id eval degenerate: f1s=$f1s")
  }

  test("q_schema_drift detects all three planted drift classes") {
    val rows =
      try graft.operators.Scalars.queries("q_schema_drift")(
        spark, TestSpark.sf).collect()
        .map(r => r.getString(0) -> r).toMap
      finally TestSpark.housekeeping()
    // type change: user ships as number AND string → conflict
    val user = rows("user")
    assert(user.getBoolean(9), "user type conflict not detected")
    assert(user.getLong(2) == 0L, "user is present in every dialect")
    assert(user.getLong(4) > 0L && user.getLong(7) > 0L)
    // nulled field: amount present-but-null in dialect 1, double in 0
    val amount = rows("amount")
    assert(amount.getString(8) == "double")
    assert(amount.getLong(3) > 0L, "amount null tally empty")
    assert(amount.getLong(2) > 0L, "amount missing tally empty")
    assert(!amount.getBoolean(9), "null must not count as a type conflict")
    // added field: extra only exists in dialect 1
    val extra = rows("extra")
    assert(extra.getString(8) == "boolean" && extra.getLong(2) > 0L)
    // conservation: present + missing = total rows, per key
    val n = Tables(spark, TestSpark.sf, "events").count()
    rows.values.foreach(r => assert(r.getLong(1) + r.getLong(2) == n))
  }

  test("q_class_balance equals a plain-Scala md5-rank recompute; classes exactly balanced") {
    import org.apache.spark.sql.functions._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows =
      try Tables(spark, TestSpark.sf, "embeddings")
        .select(col("vec_id"), col("label").cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      finally TestSpark.housekeeping()
    val byLabel = rows.groupBy(_._2)
    val target = byLabel.values.map(_.size).min
    val expected = byLabel.toSeq.sortBy(_._1).map { case (l, xs) =>
      val kept = xs.map(_._1)
        .sortBy(id => (md5hex(id.toString), id)).take(target)
      (l, xs.size.toLong, kept.size.toLong, kept.sum)
    }
    val actual =
      try graft.operators.Curation.queries("q_class_balance")(
        spark, TestSpark.sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      finally TestSpark.housekeeping()
    assert(actual == expected,
      s"first diff: ${actual.zip(expected).find { case (a, b) => a != b }}")
    // every class lands on exactly the minority count, and the fixture
    // is genuinely skewed (some class actually shrinks)
    assert(actual.map(_._3).distinct == Seq(target.toLong))
    assert(actual.exists(r => r._2 > r._3),
      "no class was downsampled — vacuous balance fixture")
  }

  test("q_jackknife equals a plain-Scala delete-one-source recompute") {
    import org.apache.spark.sql.functions._
    val per =
      try Tables(spark, TestSpark.sf, "documents")
        .groupBy(col("source"))
        .agg(sum(col("n_chars").cast("long")).as("si"),
          count(lit(1)).as("ni"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      finally TestSpark.housekeeping()
    val s = per.map(_._1).sum; val n = per.map(_._2).sum
    val g = per.length.toLong
    def r9(v: Double) = BigDecimal(v)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ts = per.map { case (si, ni) =>
      math.round((s - si) * 1e6 / (n - ni)) }
    val st = ts.map(BigInt(_)).sum
    val st2 = ts.map(t => BigInt(t) * BigInt(t)).sum
    val se = r9(math.sqrt(
      (BigInt(g - 1) * (BigInt(g) * st2 - st * st)).toDouble /
        (g * g).toDouble / 1e12))
    val theta = r9(s.toDouble / n)
    val row = run("q_jackknife").head
    assert(row.getLong(0) == g)
    assert(row.getDouble(1) == theta)
    assert(row.getDouble(2) == se)
    assert(row.getDouble(3) == r9(theta - 1.96 * se))
    assert(row.getDouble(4) == r9(theta + 1.96 * se))
    // non-degenerate: sources genuinely disagree, so the SE is real
    assert(se > 0.0, "all leave-out means identical — vacuous fixture")
  }

  test("q_sax_motifs re-derives from q_sax_words' words (one kernel, two readers)") {
    // the motif counts must be exactly the 4-gram multiset of the
    // gated per-type words — a divergence means the two queries no
    // longer share the symbolization
    val words =
      try graft.operators.Analytic.queries("q_sax_words")(
        spark, TestSpark.sf).collect()
        .map(r => r.getString(0) -> r.getString(2))
      finally TestSpark.housekeeping()
    val occ = for {
      (t, w) <- words.toSeq
      i <- 0 to w.length - 4
    } yield (w.substring(i, i + 4), t)
    val expected = occ.groupBy(_._1)
      .map { case (m, xs) =>
        (m, xs.size.toLong, xs.map(_._2).distinct.size.toLong) }
      .filter(_._2 >= 2L).toSeq
      .sortBy { case (m, n, _) => (-n, m) }
    val actual =
      try graft.operators.Analytic.queries("q_sax_motifs")(
        spark, TestSpark.sf).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      finally TestSpark.housekeeping()
    assert(expected.nonEmpty, "no repeated motifs on this fixture — vacuous")
    assert(actual == expected,
      s"first diff: ${actual.zip(expected).find { case (a, b) => a != b }}")
  }

  test("q_equi_depth_hist: brute decile boundaries and bucket depths") {
    val legs = Map(
      "lineitem.l_extendedprice" -> ("lineitem", "l_extendedprice"),
      "orders.o_totalprice" -> ("orders", "o_totalprice"),
      "events.value" -> ("events", "value"))
    val rows =
      try graft.operators.Extras.queries("q_equi_depth_hist")(
        spark, TestSpark.sf).collect()
      finally TestSpark.housekeeping()
    assert(rows.map(_.getString(0)).toSet == legs.keySet)
    legs.foreach { case (tag, (t, c)) =>
      val vs =
        try Tables(spark, TestSpark.sf, t)
          .selectExpr(s"CAST(CAST($c AS DECIMAL(12,2)) * 100 AS LONG)")
          .collect().map(_.getLong(0)).sorted
        finally TestSpark.housekeeping()
      val n = vs.length
      // min v with 10·cum(v) >= k·n == the ceil(k·n/10)-th order stat
      val bs = (1 to 9).map(k => vs((k * n + 9) / 10 - 1))
      def bucket(x: Long): Long = 1L + bs.count(_ < x)
      val byBucket = vs.groupBy(bucket).view.mapValues(_.length.toLong)
      val got = rows.filter(_.getString(0) == tag)
      assert(got.map(_.getLong(1)).toSet == byBucket.keySet)
      got.foreach { r =>
        val b = r.getLong(1)
        assert(r.getLong(3) == byBucket(b), s"$tag bucket $b depth")
        if (b <= 9) assert(r.getLong(2) == bs(b.toInt - 1),
          s"$tag boundary $b")
        else assert(r.isNullAt(2))
        // continuous cents → near-perfect equi-depth
        assert(math.abs(r.getDouble(4) - 1.0) < 0.05, s"$tag ratio")
      }
    }
  }
}
