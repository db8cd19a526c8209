package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Topics, TextAnalytics}

/** LDA invariants (SURVEY.md §5.3 — bit-exact match to the reference's
  * Gibbs sampler is impossible/not required; SURVEY.md §7.4). */
class TopicsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("LDA top terms: shape, probability cut, stopword-free") {
    val rows = Topics.topTerms(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val byTopic = rows.groupBy(_.getLong(0))
    assert(byTopic.keySet.subsetOf((0L until Topics.K.toLong).toSet))
    byTopic.values.foreach { terms =>
      assert(terms.length <= Topics.TOP_TERMS)
      // rk sequential from 1
      assert(terms.map(_.getLong(1)).sorted.toSeq == (1L to terms.length).toSeq)
    }
    rows.foreach { r =>
      val name = r.getString(2); val conf = r.getDouble(3)
      assert(conf > Topics.MIN_PROB * 100 - 1e-9 && conf <= 100.0)
      assert(!TextAnalytics.stopwords.contains(name))
      assert(name.length > 1 && !name.startsWith("http"))
    }
  }

  test("LDA is deterministic under fixed seed") {
    val a = Topics.topTerms(spark, TestSpark.sf).collect().map(_.toSeq).toSeq
    val b = Topics.topTerms(spark, TestSpark.sf).collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
