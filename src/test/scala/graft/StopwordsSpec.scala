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

  test("unreadable override file fails with the path in the message") {
    val e = intercept[IllegalArgumentException] {
      TextAnalytics.resolveStopwords(Some("/nonexistent/stopwords.txt"))
    }
    assert(e.getMessage.contains("/nonexistent/stopwords.txt"))
  }
}
