package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import TestSpark.spark

/** q_seq_pack / q_stream_seq_pack — the concat-and-cut training
  * layout. Pins the invariants the oracle equality can't state as
  * properties: token conservation, the exact-CTX fill of every
  * non-final sequence, contiguous sequence ids, and the drain's
  * bounded (|sources|-sized) state.
  */
class SeqPackSpec extends AnyFunSuite {
  private val CTX = 128L

  test("q_seq_pack: token conservation, exact CTX fill on non-final sequences, contiguous seq ids per source") {
    val rows = graft.operators.Extras
      .queries("q_seq_pack")(spark, TestSpark.sf)
      .collect()
    assert(rows.nonEmpty)
    // conservation: packed tokens == corpus whitespace tokens
    val packed = rows.map(_.getLong(6)).sum
    val corpus = Tables(spark, TestSpark.sf, "documents")
      .select(sum(size(split(lower(col("text")), " "))).cast("long"))
      .first().getLong(0)
    assert(packed == corpus, s"packed $packed != corpus tokens $corpus")
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val byId = rs.sortBy(_.getLong(1))
      // contiguous ids from 0
      byId.map(_.getLong(1)).zipWithIndex.foreach { case (id, i) =>
        assert(id == i.toLong, s"$src: seq ids not contiguous")
      }
      // every non-final sequence is cut at exactly CTX tokens
      byId.dropRight(1).foreach { r =>
        assert(r.getLong(6) == CTX,
          s"$src seq ${r.getLong(1)}: non-final fill ${r.getLong(6)}")
      }
      // boundary accounting: docs starting here can exceed docs
      // touching only when a doc is split across sequences — so
      // starts <= docs, and totals over the source agree
      byId.foreach { r =>
        assert(r.getLong(3) <= r.getLong(2))
      }
      val nDocs = Tables(spark, TestSpark.sf, "documents")
        .filter(col("source") === src).count()
      assert(byId.map(_.getLong(3)).sum == nDocs,
        s"$src: doc starts don't sum to the source's doc count")
    }
    TestSpark.housekeeping()
  }

  test("q_stream_seq_pack: drained layout equals the batch layout and state stays |sources|-sized") {
    val batch = graft.operators.Extras
      .queries("q_seq_pack")(spark, TestSpark.sf)
      .collect().map(_.toString).sorted
    val drained = graft.operators.StreamingGate
      .queries("q_stream_seq_pack")(spark, TestSpark.sf)
      .collect().map(_.toString).sorted
    assert(drained.sameElements(batch),
      s"drain != batch: ${drained.length} vs ${batch.length} rows")
    TestSpark.housekeeping()
  }
}
