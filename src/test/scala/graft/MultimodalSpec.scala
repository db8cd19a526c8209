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
}
