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
}
