package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalytics

/** The switchable stopword-list mode: loadStopwords must reproduce the
  * reference's list-merge semantics (concat EN+ES, dedup —
  * lda/index.js:23-28) from external one-word-per-line files, so a user
  * can point `graft.stopwords.files` at the reference's own lists for
  * verbatim behavior without those lists living in this repo. */
class StopwordsSpec extends AnyFunSuite {

  test("loadStopwords merges files, trims, drops blanks and duplicates, sorts") {
    val en = java.io.File.createTempFile("stop_en", ".txt")
    val es = java.io.File.createTempFile("stop_es", ".txt")
    try {
      java.nio.file.Files.writeString(en.toPath, "the\nand\n  of \n\nthe\n")
      java.nio.file.Files.writeString(es.toPath, "el\nla\nand\n")
      val merged = TextAnalytics.loadStopwords(Seq(en.getPath, es.getPath))
      assert(merged == Seq("and", "el", "la", "of", "the"))
    } finally { en.delete(); es.delete() }
  }

  test("default list is the deterministic EN∪ES union (sorted, distinct)") {
    // resolve explicitly with no override — the assertions hold even in
    // an environment where GRAFT_STOPWORDS_FILES is legitimately set
    val sw = TextAnalytics.resolveStopwords(None)
    assert(sw == sw.distinct.sorted)
    // both languages actually contributed
    assert(sw.contains("the") && sw.contains("para"))
  }

  test("override mode resolves through the file loader") {
    val f = java.io.File.createTempFile("stop_ovr", ".txt")
    try {
      java.nio.file.Files.writeString(f.toPath, "zz\naa\n")
      assert(TextAnalytics.resolveStopwords(Some(f.getPath)) == Seq("aa", "zz"))
    } finally f.delete()
  }

  test("shipped fixture lists drive the verbatim mode end-to-end") {
    // Two ORIGINAL one-word-per-line lists ship as test resources (NOT
    // the reference's lists — common function words are public
    // knowledge; the point is proving the mode, not the exact
    // membership). Wire them through the same property the lazy
    // resolver reads, resolve through the identical code path, and
    // assert the reference's merge semantics (concat EN+ES, dedup —
    // lda/index.js:23-28) hold on real files a user would point at.
    val en = new java.io.File(
      getClass.getResource("/stopwords/en_fixture.txt").toURI).getPath
    val es = new java.io.File(
      getClass.getResource("/stopwords/es_fixture.txt").toURI).getPath
    val prev = sys.props.get("graft.stopwords.files")
    sys.props("graft.stopwords.files") = s"$en,$es"
    try {
      val sw = TextAnalytics.resolveStopwords(
        sys.props.get("graft.stopwords.files"))
      assert(sw == sw.distinct.sorted)
      // both lists contributed...
      assert(sw.contains("because") && sw.contains("porque"))
      // ...and words present in BOTH files ("a", "me", "no") merged to
      // one entry — the reference's concat+dedup union, not a concat
      assert(sw.count(_ == "a") == 1 && sw.count(_ == "me") == 1 &&
        sw.count(_ == "no") == 1)
      // the resolved list plugs straight into the operator predicate
      // shape (T6's isInCollection filter over tokens):
      val spark = TestSpark.spark
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val kept = Seq("the", "quick", "porque", "zorro").toDF("t")
        .filter(!col("t").isInCollection(sw)).as[String].collect().sorted
      assert(kept.toSeq == Seq("quick", "zorro"))
    } finally {
      prev match {
        case Some(v) => sys.props("graft.stopwords.files") = v
        case None    => sys.props -= "graft.stopwords.files"
      }
    }
  }

  test("unreadable override file fails with the path in the message") {
    val e = intercept[IllegalArgumentException] {
      TextAnalytics.resolveStopwords(Some("/nonexistent/stopwords.txt"))
    }
    assert(e.getMessage.contains("/nonexistent/stopwords.txt"))
  }
}
