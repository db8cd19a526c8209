package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Approximate-aggregate sketches with their ACCURACY CONTRACT as the
  * oracle-checked output (generalization beyond the reference, which
  * only ever counts exactly — progress counters in
  * posts-from-hashtags.js:330-352; at 100 TB the exact forms of these
  * queries are what you run when you can afford a full shuffle, and
  * the sketches are what you run per-partition-pass when you cannot).
  *
  * A sketch result itself is implementation-defined (Spark's HLL++ /
  * GK summaries), so a value-equality oracle against DuckDB is
  * impossible BY DESIGN — but the published error bound is not: each
  * query returns the EXACT statistic (DuckDB-checkable) next to a
  * boolean asserting the sketch landed within its documented bound,
  * and the oracle states that boolean as a constant `true`. A Spark
  * upgrade (or a bug here) that pushed a sketch outside its contract
  * flips the boolean and fails the hash check — the accuracy contract
  * is CI-gated, not hoped for.
  *
  * Scale notes: both sketches are single-pass, mergeable partials —
  * the canonical 100 TB shape (no shuffle of raw values; partials the
  * size of the sketch, not the data). The exact sides shown next to
  * them shuffle per group exactly once.
  */
object Sketches extends graft.QueryPack {

  /** HLL++ relative standard deviation we request; the within-bound
    * check allows 4×rsd ≈ a 4-sigma band — tight enough to catch an
    * implementation break, loose enough to never flake on fixed data
    * (the sketch is deterministic per (data, rsd): same inputs, same
    * registers, no RNG). */
  private val RSD = 0.05

  /** approx_percentile accuracy parameter; guarantees rank error
    * ≤ N / accuracy. */
  private val PCTL_ACC = 100

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Distinct-cardinality sketch (HLL++) vs the exact distinct count,
    // per document source: |approx − exact| / exact ≤ 4·rsd.
    "q_sketch_distinct" -> ((s, d) => {
      Tables(s, d, "documents")
        .groupBy(col("source"))
        .agg(
          countDistinct(col("text")).as("exact_distinct"),
          approx_count_distinct(col("text"), RSD).as("approx"))
        .select(col("source"), col("exact_distinct"),
          (abs(col("approx").cast("double") - col("exact_distinct")) <=
            lit(4 * RSD) * col("exact_distinct")).as("within_bound"))
        .orderBy(col("source"))
    }),

    // Quantile sketch (GK summaries) vs the exact rank window: the
    // returned median's rank interval [count(x < v) + 1, count(x ≤ v)]
    // must intersect the target band 0.5·N ± 2·N/accuracy (double the
    // documented ε = 1/accuracy, so fixed data never flakes while an
    // implementation break still fails).
    "q_sketch_quantile" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val med = docs.groupBy(col("source"))
        .agg(percentile_approx(col("n_chars"), lit(0.5), lit(PCTL_ACC))
          .as("approx_median"),
          count(lit(1)).as("n"))
      val band = lit(2.0) * col("n") / PCTL_ACC
      docs.select(col("source"), col("n_chars"))
        .join(med, Seq("source"))
        .groupBy(col("source"), col("approx_median"), col("n"))
        .agg(
          sum(when(col("n_chars") < col("approx_median"), 1L).otherwise(0L))
            .as("below"),
          sum(when(col("n_chars") <= col("approx_median"), 1L).otherwise(0L))
            .as("at_or_below"))
        .select(col("source"), col("n"),
          ((col("at_or_below") >= col("n") * 0.5 - band) &&
            (col("below") + 1 <= col("n") * 0.5 + band)).as("within_bound"))
        .orderBy(col("source"))
    })
  )

  def oracles: Map[String, String] = Map(
    // the exact statistic is recomputed; the contract boolean is the
    // assertion — a sketch outside its bound breaks the hash match
    "q_sketch_distinct" ->
      """SELECT source,
        |  CAST(COUNT(DISTINCT text) AS BIGINT) AS exact_distinct,
        |  true AS within_bound
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q_sketch_quantile" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n, true AS within_bound
        |FROM documents GROUP BY source ORDER BY source""".stripMargin
  )
}
