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
}
