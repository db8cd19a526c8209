package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** The bloom-pre-filtered decontamination variant is DEFINED to return
  * exactly what the unfiltered operator returns — the bloom has no
  * false negatives, so it can only drop corpus postings that the exact
  * equi-join would drop anyway. This side-by-side equality is that
  * definition as a regression guard (a bloom sized or keyed wrongly
  * breaks it before oracle time). */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bloom-filtered decontamination equals the exact inverted-index form") {
    val exact = Dedup.queries("q_decontaminate")(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSeq
    val bloom = Dedup.queries("q_decontaminate_bloom")(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSeq
    assert(exact.nonEmpty)
    assert(bloom == exact,
      s"bloom=${bloom.size} rows, exact=${exact.size} rows; " +
        s"missing=${exact.diff(bloom).take(3)} extra=${bloom.diff(exact).take(3)}")
  }

  test("the shingle df cap FIRES and capped results match the declarative definition") {
    // The default cap (1000) never fires on testdata (df maxima ~10-25),
    // so the green oracle runs only prove the cap-idle path. Run the
    // kernel with a cap the data actually exceeds and pin the result to
    // an independent declarative restatement of the SAME
    // inverted-index-with-cap definition the DuckDB oracles use.
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val CAP = 2
    // the cap must actually fire: some (source, shingle) df exceeds it
    val dfs = docs.withColumn("s", explode(Dedup.shingleUdf(col("text"))))
      .groupBy(col("source"), col("s")).agg(count(lit(1)).as("df"))
    val maxDf = dfs.agg(max(col("df"))).collect()(0).getLong(0)
    assert(maxDf > CAP, s"fixture df max $maxDf does not exceed cap $CAP")
    val capped = Dedup.ngramPairsKernel(docs, CAP)
      .collect().map(_.toSeq).toSet
    // independent declarative restatement (mirrors ngramPairsSqlDuck)
    docs.createOrReplaceTempView("cap_docs")
    spark.sql(
      s"""SELECT doc_id, source,
         |  array_distinct(transform(
         |    sequence(1, greatest(size(split(lower(text), ' ')) - 2, 1)),
         |    i -> concat_ws(' ', slice(split(lower(text), ' '), i, 3)))) AS sh
         |FROM cap_docs""".stripMargin).createOrReplaceTempView("cap_sh")
    val expected = spark.sql(
      s"""WITH ex AS (
         |  SELECT doc_id, source, size(sh) AS n, s
         |  FROM cap_sh LATERAL VIEW explode(sh) t AS s),
         |sdf AS (SELECT source, s, COUNT(*) AS df FROM ex GROUP BY source, s),
         |kept AS (SELECT ex.doc_id, ex.source, ex.n, ex.s
         |         FROM ex JOIN sdf USING (source, s) WHERE sdf.df <= $CAP),
         |cand AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
         |         COUNT(*) AS c
         |  FROM kept a JOIN kept b
         |    ON a.source = b.source AND a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id, a.n, b.n)
         |SELECT id_a, id_b,
         |  round(CAST(c AS DOUBLE) / (na + nb - c), 9) AS jaccard
         |FROM cand
         |WHERE round(CAST(c AS DOUBLE) / (na + nb - c), 9) >= 0.6""".stripMargin)
      .collect().map(_.toSeq).toSet
    assert(capped == expected,
      s"capped kernel diverges from the declarative form: " +
        s"missing=${expected.diff(capped).take(3)} extra=${capped.diff(expected).take(3)}")
    // and the cap is demonstrably ACTIVE: it changes the result vs a
    // cap that never fires (the testdata has pairs only through hot
    // shingles at cap=2, or drops some) OR at minimum prunes postings
    val uncapped = Dedup.ngramPairsKernel(docs, 1000000)
      .collect().map(_.toSeq).toSet
    assert(capped != uncapped,
      "cap=2 produced identical pairs to uncapped — the cap never engaged")
  }

  test("pigeonhole Hamming join equals the all-pairs reference and never crosses") {
    import org.apache.spark.sql.functions._
    // The Manku pigeonhole bound says blocking loses NOTHING at K=3:
    // every all-pairs match must surface through some shared 8-bit
    // block. Side-by-side equality with the quadratic reference is
    // that exactness claim as a regression guard.
    val df = Dedup.queries("q_simhash_hamming")(spark, TestSpark.sf)
    val blocked = df.collect().map(_.toSeq).toSet
    assert(blocked.nonEmpty, "fixture corpus produced no Hamming<=3 pairs")
    val fp = Tables(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"))
      .unionByName(Tables(spark, TestSpark.sf, "documents")
        .filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      .unionByName(Tables(spark, TestSpark.sf, "documents")
        .filter(col("doc_id") % 10 === 1)
        .select((col("doc_id") + 200000).as("doc_id"),
          array_join(slice(split(lower(col("text")), " "), lit(2),
            greatest(size(split(col("text"), " ")) - 1, lit(0))), " ").as("text")))
      .select(col("doc_id"),
        graft.functions.SimHashExpression.simhash(col("text")).as("sh"))
    val l = fp.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val r = fp.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val allPairs = l.crossJoin(r) // test-only quadratic baseline
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("""cast(bit_count(cast(conv(sh_a, 2, 10) as bigint)
               |  ^ cast(conv(sh_b, 2, 10) as bigint)) as bigint)"""
          .stripMargin).as("hamming"))
      .filter(col("hamming") <= 3)
      .collect().map(_.toSeq).toSet
    assert(blocked == allPairs,
      s"missing=${allPairs.diff(blocked).take(3)} extra=${blocked.diff(allPairs).take(3)}")
    // and the operator plan itself is equi-join-shaped, never a cross
    val op = Dedup.queries("q_simhash_hamming")(spark, TestSpark.sf)
    op.collect()
    val plan = op.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoop"), plan.take(3000))
  }

  test("prefix-filtered set-similarity join equals the full-index definition") {
    import org.apache.spark.sql.functions._
    // Prefix filtering claims EXACTNESS: indexing only each doc's
    // n−⌈τn⌉+1 rarest shingles loses no Jaccard≥τ pair. Pin the
    // operator to an independent full-posting-list restatement of the
    // definition (the same form the DuckDB oracle uses).
    val got = Dedup.queries("q_setsim_prefix")(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty, "fixture corpus produced no Jaccard>=0.6 pairs")
    Tables(spark, TestSpark.sf, "documents")
      .createOrReplaceTempView("ss_docs")
    val corpusCte =
      """corpus AS (
        |  SELECT doc_id, text FROM ss_docs
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM ss_docs WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 200000,
        |    array_join(slice(split(lower(text), ' '), 2,
        |      greatest(size(split(text, ' ')) - 1, 0)), ' ')
        |  FROM ss_docs WHERE doc_id % 10 = 1),
        |shl AS (
        |  SELECT doc_id,
        |    array_distinct(transform(
        |      sequence(1, greatest(size(split(lower(text), ' ')) - 2, 1)),
        |      i -> concat_ws(' ', slice(split(lower(text), ' '), i, 3)))) AS sh
        |  FROM corpus)""".stripMargin
    val expected = spark.sql(
      s"""WITH $corpusCte,
         |ex AS (
         |  SELECT doc_id, size(sh) AS n, s
         |  FROM shl LATERAL VIEW explode(sh) t AS s),
         |cand AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
         |         COUNT(*) AS c
         |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id, a.n, b.n)
         |SELECT id_a, id_b,
         |  round(CAST(c AS DOUBLE) / (na + nb - c), 9) AS jaccard
         |FROM cand
         |WHERE round(CAST(c AS DOUBLE) / (na + nb - c), 9) >= 0.6""".stripMargin)
      .collect().map(_.toSeq).toSet
    assert(got == expected,
      s"missing=${expected.diff(got).take(3)} extra=${got.diff(expected).take(3)}")
    // and the prefix index is demonstrably SMALLER than the full one:
    // Σ(n − ⌈τn⌉ + 1) < Σn over the same corpus shingle sets
    val Array(prefixRows, fullRows) = spark.sql(
      s"""WITH $corpusCte
         |SELECT sum(size(sh) - ceil(size(sh) * 0.6) + 1), sum(size(sh))
         |FROM shl""".stripMargin)
      .collect()(0).toSeq.map(_.toString.toDouble.toLong).toArray
    assert(prefixRows < fullRows,
      s"prefix index ($prefixRows postings) is not smaller than full ($fullRows)")
  }

  test("q_hamming_curve re-derives from the gated q_simhash_hamming pairs (one kernel, two readers)") {
    val pairs = Dedup.queries("q_simhash_hamming")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    TestSpark.housekeeping()
    val expected = (1L to 3L).map { rr =>
      val in = pairs.filter(_._3 <= rr)
      (rr, in.size.toLong,
        (in.map(_._1) ++ in.map(_._2)).distinct.size.toLong)
    }
    val actual = Dedup.queries("q_hamming_curve")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    TestSpark.housekeeping()
    assert(actual == expected, s"got $actual want $expected")
    // nested radii: both counts non-decreasing, and the sweep is
    // non-degenerate (the radius genuinely discriminates)
    assert(actual.sliding(2).forall {
      case Seq(a, b) => a._2 <= b._2 && a._3 <= b._3 })
    assert(actual.head._2 < actual.last._2,
      "every pair at radius 1 — the curve discriminates nothing")
  }

  test("q_winnow_overlap: every planted exact copy pairs with its source at full containment") {
    import org.apache.spark.sql.functions._
    val pairs = Dedup.queries("q_winnow_overlap")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    TestSpark.housekeeping()
    val exactSources =
      Tables(spark, TestSpark.sf, "documents")
        .filter(col("doc_id") % 10 === 0).select(col("doc_id"))
        .collect().map(_.getLong(0)).toSet
    assert(pairs.nonEmpty)
    // a verbatim copy shares every rare fingerprint, so any copy pair
    // that clears the >=5-shared threshold MUST sit at containment
    // 1.0 (a source whose rare-fp set is smaller than 5 legitimately
    // produces no pair — common-gram-heavy docs index few
    // fingerprints); and at least one copy pair must clear it
    val copyPairs = pairs.filter(p =>
      exactSources.contains(p._1) && p._2 == p._1 + 100000)
    assert(copyPairs.nonEmpty,
      "no planted exact-copy pair cleared the rare-fp threshold — vacuous")
    copyPairs.foreach { p =>
      assert(p._3 == 1000000L, s"exact copy pair diluted: $p")
    }
    // and the detector is not vacuously all-ones — genuine partial
    // overlaps exist below full containment
    assert(pairs.exists(p => p._3 < 1000000L),
      "every pair at full containment — the rare-fp index is degenerate")
  }

  test("q_ngram_coverage equals an independent JVM split+trigram recompute") {
    import org.apache.spark.sql.functions._
    // independent md5 (JVM MessageDigest), independent trigram loop —
    // neither the operator's shingle UDF nor its split column is
    // trusted
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def splitOf(id: Long): String = {
      val b = java.lang.Long.parseLong(md5hex(id.toString).take(4), 16)
      if (b < 58982) "train" else if (b < 62259) "val" else "test"
    }
    def grams(text: String): Set[String] = {
      val t = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
      val k = math.max(t.length - 2, 1)
      (0 until k).map(i => t.slice(i, math.min(i + 3, t.length))
        .mkString(" ")).toSet
    }
    val docs = Tables(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => splitOf(r.getLong(0)) -> grams(r.getString(1)))
    val bySplit = docs.groupBy(_._1).map { case (s, xs) =>
      s -> xs.map(_._2).reduce(_ ++ _)
    }
    val train = bySplit.getOrElse("train", Set.empty)
    def r9(v: Double) = BigDecimal(v)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = Seq("test", "val").sorted.map { s =>
      val g = bySplit(s); val seen = g.count(train.contains)
      (s, g.size.toLong, seen.toLong, r9(1.0 - seen.toDouble / g.size))
    }
    val actual = Dedup.queries("q_ngram_coverage")(spark, TestSpark.sf)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(actual == expected, s"got $actual want $expected")
    // non-degenerate: novelty strictly inside (0, 1) on this corpus
    expected.foreach { case (_, _, _, nv) =>
      assert(nv > 0.0 && nv < 1.0, s"degenerate novelty $nv")
    }
  }
}
