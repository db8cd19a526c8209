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
}
