package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication operator family over `documents` — the training-data-
  * pipeline generalization of the reference's key-existence dedup (J1/F5).
  *
  *   - exact dedup: hash-groupBy on content
  *   - MinHash + LSH banding: shingle → 16 minhashes → 4 bands →
  *     bucket self-join → exact-Jaccard verification of candidates
  *   - SimHash: 32-bit majority fingerprint
  *   - n-gram Jaccard: exhaustive within-block pair scoring (the
  *     non-LSH baseline the banding variant is measured against)
  *
  * The raw documents table has no duplicates, so each query builds a
  * `corpus` = documents ∪ exact copies (doc_id+100000, every 10th doc)
  * ∪ first-word-dropped near copies (doc_id+200000) — derived
  * deterministically from the input on both the Spark and oracle side.
  *
  * Scale design: MinHash/SimHash signatures are computed in a single
  * projection pass (no shuffle); the only shuffles are the band-bucket
  * self-join (shuffle on band key — at 100 TB this is the standard
  * LSH-join layout: keys are uniformly-distributed hashes, so no skew)
  * and the final pair dedup. Candidate verification touches only pairs
  * that share a band, never the cross product.
  */
object Dedup extends graft.QueryPack {

  private val NUM_HASHES = 16
  private val BANDS = 4
  private val ROWS_PER_BAND = NUM_HASHES / BANDS

  private def toks(c: Column): Column = split(lower(c), " ")

  /** Word-trigram shingles (distinct), the unit of Jaccard similarity. */
  private def shingles(tokens: Column): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(size(tokens) - 2, lit(1))),
      i => concat_ws(" ", slice(tokens, i, lit(3)))))

  /** corpus: documents ∪ exact dups ∪ near dups (see object doc). */
  private def corpus(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("source"), col("text"))
    val exactCopies = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("source"), col("text"))
    val nearCopies = docs.filter(col("doc_id") % 10 === 1)
      .select((col("doc_id") + 200000).as("doc_id"), col("source"),
        array_join(slice(split(lower(col("text")), " "), lit(2),
          greatest(size(split(col("text"), " ")) - 1, lit(0))), " ").as("text"))
    base.unionByName(exactCopies).unionByName(nearCopies)
  }

  private val corpusSqlDuck: String =
    """corpus AS (
      |  SELECT doc_id, source, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, source, text FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 200000, source,
      |         array_to_string((string_split(lower(text), ' '))[2:], ' ')
      |  FROM documents WHERE doc_id % 10 = 1)""".stripMargin

  /** MinHash signature j = min over shingles of md5(j:shingle); hex md5
    * strings order lexicographically, so no numeric conversion is needed
    * and the same value is computable in any engine. */
  private def minhashSigs(sh: Column): Column =
    transform(sequence(lit(0), lit(NUM_HASHES - 1)),
      j => array_min(transform(sh, x => md5(concat(j, lit(":"), x)))))

  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact dedup: content-hash groupBy, keep smallest id (deterministic
    // winner, unlike dropDuplicates whose survivor is partition-dependent).
    "q_dedup_exact" -> ((s, d) => {
      corpus(Tables(s, d, "documents"))
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
        .filter(col("n_copies") > 1)
        .orderBy(col("keeper_id"))
    }),

    // MinHash + LSH banding with exact-Jaccard candidate verification.
    "q_dedup_minhash" -> ((s, d) => {
      val c = corpus(Tables(s, d, "documents"))
        .withColumn("sh", shingles(toks(col("text"))))
        .withColumn("sigs", minhashSigs(col("sh")))
      val banded = c.select(
        col("doc_id"), col("sh"),
        explode(transform(sequence(lit(0), lit(BANDS - 1)), b => struct(
          b.as("band"),
          md5(concat_ws("|", slice(col("sigs"), b * ROWS_PER_BAND + 1,
            lit(ROWS_PER_BAND)))).as("bkey")))).as("bb"))
        .select(col("doc_id"), col("sh"), col("bb.band"), col("bb.bkey"))
      val l = banded.select(col("band"), col("bkey"),
        col("doc_id").as("id_a"), col("sh").as("sh_a"))
      val r = banded.select(col("band"), col("bkey"),
        col("doc_id").as("id_b"), col("sh").as("sh_b"))
      l.join(r, Seq("band", "bkey"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(jaccard(col("sh_a"), col("sh_b")), 9).as("jaccard"))
        .distinct()
        .filter(col("jaccard") >= 0.6)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // SimHash: 32-bit majority fingerprint — bit i is the sign of the
    // token-weighted sum of the top bit of md5 nibble i. Expressed as a
    // single SQL expression (nested HOF lambdas with a dynamic-position
    // instr, which the Scala functions API can't spell).
    "q_dedup_simhash" -> ((s, d) => {
      corpus(Tables(s, d, "documents"))
        .select(col("doc_id"), expr(
          """array_join(transform(sequence(1, 32), i ->
            |  CASE WHEN aggregate(split(lower(text), ' '), 0, (acc, w) ->
            |    acc + CASE WHEN instr('0123456789abcdef', substring(md5(w), i, 1)) - 1 >= 8
            |              THEN 1 ELSE -1 END) >= 0
            |  THEN '1' ELSE '0' END), '')""".stripMargin).as("simhash"))
        .orderBy(col("doc_id"))
    }),

    // n-gram Jaccard near-dup: exhaustive pairs within a `source` block —
    // the blocking baseline (LSH above replaces the block cross-product
    // with hash buckets at scale).
    "q_dedup_ngram_jaccard" -> ((s, d) => {
      val c = corpus(Tables(s, d, "documents"))
        .withColumn("sh", shingles(toks(col("text"))))
      val l = c.select(col("source"), col("doc_id").as("id_a"), col("sh").as("sh_a"))
      val r = c.select(col("source"), col("doc_id").as("id_b"), col("sh").as("sh_b"))
      l.join(r, Seq("source"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(jaccard(col("sh_a"), col("sh_b")), 9).as("jaccard"))
        .filter(col("jaccard") >= 0.6)
        .orderBy(col("id_a"), col("id_b"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      s"""WITH $corpusSqlDuck
         |SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper_id,
         |       COUNT(*) AS n_copies
         |FROM corpus GROUP BY md5(text) HAVING COUNT(*) > 1
         |ORDER BY keeper_id""".stripMargin,

    "q_dedup_minhash" ->
      s"""WITH $corpusSqlDuck,
         |sh AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(
         |      range(1, greatest(len(string_split(lower(text),' ')) - 2, 1) + 1),
         |      i -> array_to_string((string_split(lower(text),' '))[i:i+2], ' '))) AS sh
         |  FROM corpus),
         |sigs AS (
         |  SELECT doc_id, sh,
         |    list_transform(range(0, $NUM_HASHES),
         |      j -> list_min(list_transform(sh, x -> md5(j || ':' || x)))) AS sigs
         |  FROM sh),
         |banded AS (
         |  SELECT doc_id, sh, b AS band,
         |    md5(array_to_string(sigs[b*$ROWS_PER_BAND+1 : b*$ROWS_PER_BAND+$ROWS_PER_BAND], '|')) AS bkey
         |  FROM sigs, unnest(range(0, $BANDS)) AS t(b))
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |        len(list_distinct(a.sh || b.sh)), 9) AS jaccard
         |FROM banded a JOIN banded b
         |  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
         |WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |            len(list_distinct(a.sh || b.sh)), 9) >= 0.6
         |ORDER BY id_a, id_b""".stripMargin,

    "q_dedup_simhash" ->
      s"""WITH $corpusSqlDuck
         |SELECT doc_id,
         |  array_to_string(list_transform(range(1, 33), i ->
         |    CASE WHEN list_sum(list_transform(string_split(lower(text), ' '),
         |      w -> CASE WHEN strpos('0123456789abcdef', substring(md5(w), i, 1)) - 1 >= 8
         |                THEN 1 ELSE -1 END)) >= 0
         |         THEN '1' ELSE '0' END), '') AS simhash
         |FROM corpus ORDER BY doc_id""".stripMargin,

    "q_dedup_ngram_jaccard" ->
      s"""WITH $corpusSqlDuck,
         |sh AS (
         |  SELECT doc_id, source,
         |    list_distinct(list_transform(
         |      range(1, greatest(len(string_split(lower(text),' ')) - 2, 1) + 1),
         |      i -> array_to_string((string_split(lower(text),' '))[i:i+2], ' '))) AS sh
         |  FROM corpus)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |        len(list_distinct(a.sh || b.sh)), 9) AS jaccard
         |FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
         |WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |            len(list_distinct(a.sh || b.sh)), 9) >= 0.6
         |ORDER BY id_a, id_b""".stripMargin
  )
}
