package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaRow, MediaFeatures}

class MultimodalSpec extends AnyFunSuite {

  test("stub decoder: deterministic features from bytes") {
    val bytes = "abcdefghijklmnopqrstuvwxyz".getBytes("UTF-8")
    val f = Multimodal.decodeStub(MediaRow(7L, bytes))
    assert(f == MediaFeatures(7L, 26L, "ab",
      'a'.toLong * 256 + 'b', 'c'.toLong * 256 + 'd',
      'a'.toLong + 'q'.toLong)) // frame sample at 0 and 16
  }

  test("short payloads don't crash header parsing") {
    val f = Multimodal.decodeStub(MediaRow(1L, "x".getBytes))
    assert(f.n_bytes == 1 && f.fake_width == 'x'.toLong * 256 && f.fake_height == 0)
  }

  test("mapPartitions batch plumbing produces one row per input") {
    val spark = TestSpark.spark
    import spark.implicits._
    val media = (1L to 200L).map(i => MediaRow(i, s"payload-$i".getBytes)).toDF()
    val out = Multimodal.extractFeatures(spark, media)
    assert(out.count() == 200)
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == (1L to 200L))
  }

  test("LabelGen UDTF plans as Generate and works from SQL LATERAL VIEW") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.col
    GraftExtensions.register(spark)
    val df = Tables(spark, TestSpark.sf, "documents").limit(10)
      .select(col("doc_id"), col("text").cast("binary").as("content"))
    val viaCol = df.select(col("doc_id"), graft.functions.LabelGen.labels(col("content")))
    // the analyzer wraps the generator in a Generate node, like explode
    assert(viaCol.queryExecution.executedPlan.toString.contains("Generate"),
      viaCol.queryExecution.executedPlan.toString.take(1000))
    assert(viaCol.schema.fieldNames.toSeq ==
      Seq("doc_id", "label_rank", "confidence", "name"))
    df.createOrReplaceTempView("media_tmp")
    val viaSql = spark.sql(
      """SELECT doc_id, l.label_rank, l.confidence, l.name
        |FROM media_tmp LATERAL VIEW graft_labels(content) l""".stripMargin)
    assert(viaSql.collect().map(_.toSeq).toSet ==
      viaCol.collect().map(_.toSeq).toSet)
    // 1-3 labels per item, rank starts at 1, confidence descends from 100
    val rows = viaCol.collect()
    assert(rows.length >= 10 && rows.length <= 30)
    assert(rows.filter(_.getLong(1) == 1L).forall(_.getDouble(2) == 100.0))
  }

  test("transformStub: resize stride, frame grid, and edge cases") {
    import graft.operators.Multimodal.{transformStub, MediaRow}
    // 600 bytes -> 3 frames, sampled {0, 1, 2}; resized = 150 bytes
    val b = Array.tabulate(600)(i => (i % 251).toByte)
    val fr = transformStub(MediaRow(7L, b))
    assert(fr.map(_.frame_no) == Seq(0L, 1L, 2L))
    assert(fr.forall(_.n_frames == 3L))
    assert(fr.forall(_.resized_len == 150L))
    assert(fr.map(_.frame_offset) == Seq(0L, 256L, 512L))
    // checksum of a partial last frame counts only real bytes
    assert(fr(2).frame_checksum ==
      (512 until 600).map(i => (i % 251) & 0xff).sum.toLong)
    // empty payload: one frame, zero checksum, md5 of empty input
    val e = transformStub(MediaRow(8L, Array.emptyByteArray))
    assert(e.map(r => (r.frame_no, r.frame_checksum, r.n_frames)) ==
      Seq((0L, 0L, 1L)))
    assert(e.head.resized_md5 == "d41d8cd98f00b204e9800998ecf8427e")
  }
}
