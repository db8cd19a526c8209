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

  test("q_seq_manifest: segment grain re-aggregates to the q_seq_pack report exactly") {
    val man = graft.operators.Extras
      .queries("q_seq_manifest")(spark, TestSpark.sf).collect()
    val pack = graft.operators.Extras
      .queries("q_seq_pack")(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    val reAgg = man.groupBy(r => (r.getString(0), r.getLong(1))).view
      .mapValues { rs =>
        (rs.length.toLong,
          rs.count(_.getBoolean(5)).toLong,
          rs.map(_.getLong(2)).min, rs.map(_.getLong(2)).max,
          rs.map(_.getLong(4)).sum)
      }.toMap
    assert(reAgg == pack, "manifest does not re-aggregate to the pack report")
    // segments tile each sequence exactly: offsets + lengths chain
    man.groupBy(r => (r.getString(0), r.getLong(1))).foreach { case (k, rs) =>
      val ordered = rs.sortBy(_.getLong(3))
      var cursor = 0L
      ordered.foreach { r =>
        assert(r.getLong(3) == cursor, s"$k: gap/overlap at ${r.getLong(3)}")
        cursor += r.getLong(4)
      }
      assert(cursor <= CTX, s"$k: sequence overfilled to $cursor")
    }
    TestSpark.housekeeping()
  }

  test("foldSeqPack: invariant across ORDERED slicings (1, 2 and 5 cuts), not just the drain's 3") {
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, TestSpark.sf, "documents")
      .select(col("source"), col("doc_id"), col("text"))
    val mx = docs.agg(max(col("doc_id"))).first().getLong(0)
    def drainWith(cuts: Int): Array[String] = {
      val root = java.nio.file.Files
        .createTempDirectory(s"seqpack_inv_$cuts").toFile.getAbsolutePath
      val state = root + "/st"
      val out = root + "/out"
      val bounds = (0 to cuts).map(i => mx * i / cuts)
      bounds.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), i) =>
        val slice = docs.filter(
          (if (i == 0) col("doc_id") >= 0L else col("doc_id") > lo) &&
            col("doc_id") <= hi)
        graft.operators.StreamingGate.foldSeqPack(state, out)(slice, i.toLong)
      }
      val emitted = spark.read.parquet(out + "/b*")
      val st = spark.read.parquet(state).filter(col("oseq_id") >= 0L)
        .select(col("source"), col("oseq_id").as("seq_id"),
          col("o_n_docs").as("n_docs"),
          col("o_n_doc_starts").as("n_doc_starts"),
          col("o_first_doc").as("first_doc"),
          col("o_last_doc").as("last_doc"),
          col("o_n_tokens").as("n_tokens"))
      val r = graft.operators.Extras.seqPackReport(emitted.unionByName(st))
        .collect().map(_.toString).sorted
      graft.Fs.deleteRec(new java.io.File(root))
      r
    }
    val one = drainWith(1)
    val two = drainWith(2)
    val five = drainWith(5)
    assert(one.sameElements(two), "1-cut vs 2-cut packing diverged")
    assert(one.sameElements(five), "1-cut vs 5-cut packing diverged")
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
