package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import TestSpark.spark

/** q_unigram_lm — the Viterbi-EM unigram tokenizer trainer (VERDICT
  * r12 item 4). Pins the prune-round invariants the DuckDB oracle
  * can't see as *properties*: required-character survival, vocab set
  * algebra across the prune, probability normalization, and the exact
  * char-conservation law of a Viterbi segmentation (every char of
  * every word is covered by exactly one piece, so Σ cnt·len over the
  * piece table equals the corpus' weighted char total — an integer
  * identity, not an approximation).
  */
class UnigramLmSpec extends AnyFunSuite {

  private lazy val rows = graft.operators.TextAnalytics
    .queries("q_unigram_lm")(spark, TestSpark.sf)
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getDouble(4), r.getBoolean(5))) // (rnd, piece, len, cnt, p, kept)

  private lazy val weightedChars: Long = {
    val d = Tables(spark, TestSpark.sf, "documents")
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .agg(sum(length(col("w"))).as("n")).collect()(0)
    d.getLong(0)
  }

  test("required chars survive the prune; kept 2-grams respect the grid width") {
    val r1 = rows.filter(_._1 == 1L)
    assert(r1.nonEmpty)
    r1.filter(_._3 == 1L).foreach { r =>
      assert(r._6, s"single-char piece '${r._2}' was pruned")
    }
    val keptGrams = r1.count(r => r._3 == 2L && r._6)
    assert(keptGrams <= 16, s"prune kept $keptGrams 2-grams")
    // non-degenerate: the seed floor admitted real 2-grams to prune
    assert(r1.count(_._3 == 2L) > keptGrams,
      "prune had nothing to drop - fixture too small for the floor")
  }

  test("round-2 vocabulary is exactly the kept round-1 set") {
    val kept1 = rows.filter(r => r._1 == 1L && r._6).map(_._2).toSet
    val vocab2 = rows.filter(_._1 == 2L).map(_._2).toSet
    assert(vocab2 == kept1,
      s"extra=${(vocab2 -- kept1).take(5)} missing=${(kept1 -- vocab2).take(5)}")
    assert(rows.filter(_._1 == 2L).forall(_._6))
  }

  test("probabilities normalize per round (round-9 ulp tolerance)") {
    Seq(1L, 2L).foreach { rnd =>
      val rs = rows.filter(_._1 == rnd)
      val tot = rs.map(_._5).sum
      assert(math.abs(tot - 1.0) <= 5e-10 * rs.length + 1e-9,
        s"round $rnd probs sum to $tot")
    }
  }

  test("Viterbi char conservation: sum(cnt*len) per round equals the weighted corpus chars exactly") {
    Seq(1L, 2L).foreach { rnd =>
      val covered = rows.filter(_._1 == rnd).map(r => r._4 * r._3).sum
      assert(covered == weightedChars,
        s"round $rnd covers $covered of $weightedChars chars")
    }
    // and the piece totals respect the 1-or-2-char piece bound
    Seq(1L, 2L).foreach { rnd =>
      val pieces = rows.filter(_._1 == rnd).map(_._4).sum
      assert(pieces >= (weightedChars + 1) / 2 && pieces <= weightedChars,
        s"round $rnd piece total $pieces outside [chars/2, chars]")
    }
    // pruning 2-grams can only lengthen segmentations: the round-2
    // piece total must not shrink (measured property on the fixture)
    val p1 = rows.filter(_._1 == 1L).map(_._4).sum
    val p2 = rows.filter(_._1 == 2L).map(_._4).sum
    assert(p2 >= p1, s"piece total shrank across the prune: $p1 -> $p2")
    TestSpark.housekeeping()
  }

  test("encode = train: q_unigram_encode piece totals equal the round-2 counts exactly") {
    val enc = graft.operators.TextAnalytics
      .queries("q_unigram_encode")(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(enc.nonEmpty)
    // both count the SAME best segmentations (one definition, two
    // grains): sum over docs of pieces == sum over pieces of round-2
    // counts — an integer identity, not an approximation
    val encTotal = enc.map(_._3).sum
    val r2Total = rows.filter(_._1 == 2L).map(_._4).sum
    assert(encTotal == r2Total,
      s"encode total $encTotal != round-2 count total $r2Total")
    // per-doc bounds: pieces within [ws-token chars / 2, chars]
    enc.filter(_._2 > 0).foreach { case (id, ws, np) =>
      assert(np >= ws, s"doc $id: fewer pieces than words")
    }
    TestSpark.housekeeping()
  }

  test("encode kernel refuses an untrained (empty) cost map") {
    // the model is threaded explicitly (no process-global handoff);
    // an empty map means the caller skipped training — fail loudly
    // instead of segmenting everything at the unknown-piece sentinel
    val docs = Tables(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"))
    val e = intercept[IllegalArgumentException] {
      graft.operators.TextAnalytics.unigramEncodeFrame(Map.empty)(docs)
    }
    assert(e.getMessage.contains("trained cost map"))
  }
}
