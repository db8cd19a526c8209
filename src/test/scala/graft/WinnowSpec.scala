package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.WinnowKernel

/** Winnowing fingerprint kernel: agreement with a brute-force O(n·K)
  * reference, the guarantee the algorithm gives (shared fingerprints
  * under content insertion), and degenerate inputs. */
class WinnowSpec extends AnyFunSuite {
  import WinnowKernel.{B, K, M, W}

  /** Brute force: per-gram polynomial hash, window minima, distinct. */
  private def reference(s: String): Seq[Long] = {
    val bytes = s.getBytes("UTF-8")
    val nh = bytes.length - K + 1
    if (nh < W) return Seq.empty
    val h = (0 until nh).map { i =>
      (0 until K).foldLeft(0L)((acc, j) => (acc * B + (bytes(i + j) & 0xffL)) % M)
    }
    (0 to nh - W).map(i => h.slice(i, i + W).min).distinct.sorted
  }

  private def kernel(s: String): Seq[Long] =
    WinnowKernel.winnow(UTF8String.fromString(s)).toLongArray().toSeq

  test("rolling hash + window minima match the brute-force reference") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaa",                  // degenerate: all grams equal
      "abcdefghijk",                            // exactly K+W-1 bytes: one window
      "Photo of tacos. Cafe Estrella, Chicago." // punctuation/mixed case
    )
    docs.foreach(d => assert(kernel(d) == reference(d), d))
  }

  test("shorter than K+W-1 bytes yields no full window -> empty") {
    assert(kernel("") == Seq.empty)
    assert(kernel("abcdefgh") == Seq.empty)   // K bytes: 1 gram < W
    assert(kernel("abcdefghij") == Seq.empty) // K+W-2: W-1 grams
  }

  test("winnowing guarantee: an unmodified region keeps shared fingerprints") {
    val doc = "the quick brown fox jumps over the lazy dog again and again"
    val edited = "INSERTED PREFIX >> " + doc
    val shared = kernel(doc).toSet.intersect(kernel(edited).toSet)
    // the whole original survives verbatim → many shared fingerprints
    assert(shared.size >= kernel(doc).size / 2,
      s"shared=${shared.size} of ${kernel(doc).size}")
  }

  test("expression and SQL registration agree with the kernel") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions.col
    val doc = "the quick brown fox jumps over the lazy dog"
    val viaSql = spark.sql(s"SELECT graft_winnow('$doc') AS fp")
      .collect()(0).getSeq[Long](0).toSeq
    assert(viaSql == kernel(doc))
    val viaCol = Tables(spark, TestSpark.sf, "documents").limit(5)
      .select(col("doc_id"), graft.functions.WinnowExpression.winnow(col("text")).as("fp"))
      .collect()
    viaCol.foreach(r => assert(r.getSeq[Long](1).nonEmpty))
  }
}
