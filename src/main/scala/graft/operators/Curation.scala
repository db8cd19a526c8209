package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The end-to-end curation FLAGSHIP — the composed trace a
  * training-data pipeline runs from raw crawl to training shards, the
  * way `Pipeline.scala` composes the reference's ETL trace
  * (garciadiazjaime/etl-instagram `module/instagram/etl.js`: one
  * fetch→transform→filter→persist chain; here the chain is the
  * LLM-corpus analogue). Every stage is a SHIPPED kernel, invoked by
  * reference, never re-stated:
  *
  *   1. quality    — [[TextAnalytics.qualityReasons]] (length / lang /
  *                   stopwords / repetition, first-failing gate)
  *   2. exact      — [[Dedup.funnelReasons]] stage 1 (content-hash
  *   3. neardup    —   keeper), stage 2 (pair-partner rule),
  *   4. benchmark  —   stage 3 (eval-set membership) and
  *   5. contaminated — stage 4 (capped trigram containment)
  *   6. mixture    — q_mixture_sample's per-source keep-fraction on
  *                   the stable md5 bucket
  *   survivors    → q_shard_plan's md5-bucket shard assignment
  *
  * Per-document FIRST-FAILING-STAGE attribution: `reason` is the
  * earliest stage that drops the doc (NULL = kept), so per-stage drop
  * counts read straight off the output and the funnel is auditable
  * doc by doc — the q_quality_gate/q_dedup_pipeline convention
  * composed end to end.
  *
  * Stage ORDER is the production order: the narrow projection gates
  * (quality) run first and shrink the corpus before the expensive
  * pair kernel ever shuffles a shingle; sampling (mixture) runs last
  * so its keep-fraction applies to the CLEAN corpus, not to docs
  * dedup would drop anyway.
  *
  * Scale: no stage adds a shuffle beyond what its standalone operator
  * pays — quality's bigram agg (uniform doc_id key), the funnel's
  * hash group + capped shingle self-join + doc-keyed flag joins, and
  * the mixture/shard stage is a pure per-row md5 projection. The
  * composition itself joins only on doc_id (uniform). Input is the
  * planted dedup corpus ([[Dedup.corpus]]) so the exact/neardup
  * stages are structurally non-vacuous at any SF, exactly like the
  * standalone funnel.
  */
object Curation extends graft.QueryPack {

  /** q_mixture_sample's per-source keep fraction (tiered by source
    * index) — restated by reference so the two stay one definition. */
  private def mixtureFrac: Column = {
    val srcIdx = substring(col("source"), 4, 10).cast("int")
    when(srcIdx < 5, 1.0).when(srcIdx < 10, 0.5)
      .when(srcIdx < 15, 0.25).otherwise(0.1)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_curation_pipeline" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      // persist: the quality frame feeds BOTH the funnel input (via the
      // survivor filter) and the final attribution join — its bigram
      // agg + HOF gate columns are the r8 persist lesson's shape (a
      // subtree AQE's ReusedExchange cannot deduplicate across the two
      // consumers); measured 3.39 → 2.65 s min at sf0.1 cpus=32
      val q = TextAnalytics.qualityReasons(
        Dedup.corpus(docs).select(col("doc_id"), col("source"), col("text")))
        .persist()
      val qSurv = q.filter(col("reason").isNull)
        .select(col("doc_id"), col("source"), col("text"))
      val f = Dedup.funnelReasons(qSurv, docs)
        .withColumnRenamed("reason", "f_reason")
      // the same 16-bit md5 bucket serves the mixture draw AND the
      // shard key (q_split_hash's stable-key device: deterministic,
      // partitioning/cluster-size invariant, restated in the oracle)
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 4),
        16, 10).cast("long")
      q.select(col("doc_id"), col("source"), col("reason").as("q_reason"))
        .join(f, Seq("doc_id"), "left_outer")
        .withColumn("bucket", bucket)
        .withColumn("reason",
          coalesce(col("q_reason"), col("f_reason"),
            when(col("bucket") >= mixtureFrac * 65536, "mixture")))
        .select(col("doc_id"), col("source"),
          col("reason").isNull.as("keep"), col("reason"),
          when(col("reason").isNull, col("bucket") % 32).as("shard"))
        .orderBy(col("doc_id"))
    }),

    // CCNet-style line-frequency boilerplate strip (Wenzek et al.,
    // LREC'20 §3.2: drop paragraphs whose hash recurs across many
    // documents — nav bars, footers, cookie banners). The corpus here
    // has no newlines, so the "line" unit is the deterministic
    // non-overlapping 5-token block (array-side `transform`+`slice`,
    // NO token explode — one generator row per block, 5× fewer than
    // per-token). A block seen in ≥3 DISTINCT documents is boilerplate.
    // Plan shape: block build is a narrow codegen projection; the df
    // table is one map-combinable (block → distinct-doc count) agg;
    // the block↔df join shuffles on block text (at 100 TB you'd key
    // both sides by a 128-bit content hash to make the shuffle key
    // fixed-width — text keys here keep the oracle engine-identical);
    // the per-doc roll-up is a uniform doc_id-keyed agg. No windows,
    // no corpus-wide state.
    "q_boilerplate_strip" -> ((s, d) => {
      val M = 3
      val blocks = Tables(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(0, (size(t)-1) div 5), " +
            "i -> concat_ws(' ', slice(t, i*5+1, 5)))"))
          .as(Seq("b", "btxt")))
        .withColumn("n_tok", size(split(col("btxt"), " ")).cast("long"))
      val dfTable = blocks.groupBy(col("btxt"))
        .agg(countDistinct(col("doc_id")).as("bdf"))
      blocks.join(dfTable, Seq("btxt"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_blocks"),
          sum(when(col("bdf") >= M, 1L).otherwise(0L)).as("n_boiler"),
          sum(col("n_tok")).as("n_tokens"),
          sum(when(col("bdf") < M, col("n_tok")).otherwise(0L))
            .as("kept_tokens"))
        .withColumn("boiler_ratio",
          round((col("n_tokens") - col("kept_tokens")).cast("double") /
            col("n_tokens"), 9))
        .orderBy(col("doc_id"))
    }),

    // Class balancing — the label-skew repair of supervised curation
    // (a classifier trained on a 10:1 label mix learns the prior, not
    // the signal): every label downsampled to EXACTLY the minority
    // count by keeping each class's lowest-md5 rows (the stable-key
    // device: deterministic, engine- and layout-free, and a
    // per-class uniform sample because md5 order is independent of
    // any data order). The kept SET is pinned by a vec_id checksum,
    // not just counts — a different-but-same-size sample would hash
    // elsewhere. Scale: the per-label rank is one window partitioned
    // by label (classes spread across executors; the in-class sort
    // is the price of EXACT-count sampling — the constant-time
    // md5-threshold alternative that trades exactness for no sort is
    // q_mixture_sample's fraction rule); the minority count is a
    // 1-row broadcast.
    "q_class_balance" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"))
      val target = e.groupBy(col("label")).agg(count(lit(1)).as("n"))
        .agg(min(col("n")).as("target"))
      val w = Window.partitionBy(col("label"))
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      e.crossJoin(broadcast(target))
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("keep", col("rk") <= col("target"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_before"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_after"),
          sum(when(col("keep"), col("vec_id")).otherwise(0L))
            .as("kept_checksum"))
        .orderBy(col("label"))
    }))

  def oracles: Map[String, String] = Map(

    // the same three shared fragments, chained: planted corpus →
    // quality reasons → funnel reasons over the quality survivors →
    // mixture/shard tail
    "q_curation_pipeline" ->
      s"""WITH ${Dedup.corpusSqlDuck},
         |${TextAnalytics.qualityReasonsSqlDuckFrom("corpus")},
         |qsurv AS (SELECT doc_id, source, text FROM qreason
         |          WHERE reason IS NULL),
         |${Dedup.funnelReasonsSqlDuckFrom("qsurv")},
         |m AS (
         |  SELECT q.doc_id, q.source,
         |    COALESCE(q.reason, f.reason,
         |      CASE WHEN q.bucket >=
         |        (CASE WHEN CAST(substr(q.source, 4) AS INTEGER) < 5 THEN 1.0
         |              WHEN CAST(substr(q.source, 4) AS INTEGER) < 10 THEN 0.5
         |              WHEN CAST(substr(q.source, 4) AS INTEGER) < 15 THEN 0.25
         |              ELSE 0.1 END) * 65536
         |      THEN 'mixture' END) AS reason,
         |    q.bucket
         |  FROM (SELECT doc_id, source, reason,
         |          CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
         |            AS INTEGER) AS BIGINT) AS bucket
         |        FROM qreason) q
         |  LEFT JOIN freason f ON q.doc_id = f.doc_id)
         |SELECT doc_id, source, reason IS NULL AS keep, reason,
         |  CASE WHEN reason IS NULL THEN bucket % 32 END AS shard
         |FROM m ORDER BY doc_id""".stripMargin,

    // same 5-token non-overlapping blocks, same df>=3 boilerplate rule
    "q_boilerplate_strip" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |blk AS (
        |  SELECT doc_id,
        |    array_to_string(t[(i*5+1):(i*5+5)], ' ') AS btxt,
        |    CAST(len(t[(i*5+1):(i*5+5)]) AS BIGINT) AS n_tok
        |  FROM (SELECT doc_id, t,
        |          unnest(range(0, ((len(t)-1)//5)+1)) AS i FROM tk)),
        |dfreq AS (
        |  SELECT btxt, COUNT(DISTINCT doc_id) AS bdf FROM blk GROUP BY btxt)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |  CAST(SUM(CASE WHEN bdf >= 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_boiler,
        |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN bdf < 3 THEN n_tok ELSE 0 END) AS BIGINT)
        |    AS kept_tokens,
        |  ROUND(CAST(SUM(CASE WHEN bdf >= 3 THEN n_tok ELSE 0 END)
        |    AS DOUBLE) / SUM(n_tok), 9) AS boiler_ratio
        |FROM blk JOIN dfreq USING (btxt)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // same minority target, same (md5, vec_id) keep rank, same
    // kept-set checksum
    "q_class_balance" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
        |tgt AS (SELECT MIN(n) AS target FROM (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY label)),
        |rk AS (
        |  SELECT label, vec_id,
        |    ROW_NUMBER() OVER (PARTITION BY label
        |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk,
        |    target
        |  FROM e, tgt)
        |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_before,
        |  CAST(SUM(CASE WHEN rk <= target THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_after,
        |  CAST(SUM(CASE WHEN rk <= target THEN vec_id ELSE 0 END) AS BIGINT)
        |    AS kept_checksum
        |FROM rk GROUP BY label ORDER BY label""".stripMargin
  )
}
