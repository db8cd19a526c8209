package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.CountVectorizer
import org.apache.spark.ml.clustering.LDA
import graft.Tables

/** Topic modeling — the reference's flagship algorithmic chain
  * (SURVEY.md §2.6 T1-T9: assemble → tokenize → normalize → stem →
  * stopword-drop → vectorize → LDA → top-k terms with min-probability
  * cut). The reference hand-rolls a collapsed Gibbs sampler
  * (module/instagram/lda/index.js:120-289); per SURVEY.md §7.3 we use
  * `org.apache.spark.ml.clustering.LDA` instead — bit-exact match is
  * impossible and not required (the reference's own sampler is
  * nondeterministic, SURVEY.md §7.4), so this query is registered
  * WITHOUT a SQL oracle and its invariants are covered by TopicsSpec.
  *
  * Scale: CountVectorizer + online-variational LDA are the standard
  * distributed layout (document-partitioned, vocabulary broadcast);
  * top-k term extraction is driver-side over the tiny topic matrix.
  */
object Topics extends graft.QueryPack {

  val K = 3
  val TOP_TERMS = 7          // reference: topics.js:6 (terms = 7)
  val MIN_PROB = 0.02        // reference: lda/index.js:86 (prob >= 2%)

  def topTerms(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        filter(split(lower(col("text")), " "),
          t => length(t) > 1 && !t.startsWith("http") &&
            !t.isInCollection(TextAnalytics.stopwords)).as("tokens"))
      .filter(size(col("tokens")) > 0) // T10: empty-doc filter
    val cv = new CountVectorizer()
      .setInputCol("tokens").setOutputCol("features").fit(docs)
    val vectorized = cv.transform(docs)
    val lda = new LDA().setK(K).setSeed(42L).setMaxIter(10)
    val model = lda.fit(vectorized)
    val vocab = cv.vocabulary
    import spark.implicits._
    model.describeTopics(TOP_TERMS)
      .as[(Int, Array[Int], Array[Double])]
      .flatMap { case (topic, termIdx, weights) =>
        termIdx.zip(weights).zipWithIndex.collect {
          case ((ti, w), rk) if w >= MIN_PROB =>
            // reference shape {confidence, name}: topics.js:37-47
            (topic.toLong, (rk + 1).toLong, vocab(ti), w * 100.0)
        }
      }
      .toDF("topic", "rk", "name", "confidence")
      .orderBy(col("topic"), col("rk"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_lda_topics" -> ((s, d) => topTerms(s, d))
  )

  // Not SQL-expressible (iterative ML) — driver records rows-only check;
  // distributional invariants are asserted in TopicsSpec.
  def oracles: Map[String, String] = Map()
}
