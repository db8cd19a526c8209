package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{AlertSink, EventsStream}

/** K6 alert sink: row-level sentinel→alert mapping (oracle-gated as
  * q_alert_rows; shape re-checked here), the durable foreachBatch
  * alert writer, and the job-level STREAM_FAILED listener on the ST8
  * poison-pill path — the reference's sendEmail surface with the
  * transport at the offline boundary. */
class AlertSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("alertFor maps sentinels in reference order, first hit wins, clean is null") {
    import spark.implicits._
    val pages = Seq(
      ("a", "x Login • Instagram y"),
      ("b", "Suspicious Login Attempt"),
      ("c", "Your Account Has Been Temporarily Locked"),
      ("d", "Suspicious Login Attempt then Login • Instagram"),
      ("e", "a perfectly fine feed page")).toDF("id", "page")
    val got = pages.select(col("id"), AlertSink.alertFor(col("page")).as("alert"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("a") == "LOGIN_REQUIRED")
    assert(got("b") == "SUSPICIOUS_ATTEMPT")
    assert(got("c") == "ACCOUNT_LOCKED")
    assert(got("d") == "LOGIN_REQUIRED") // priority: first sentinel wins
    assert(got("e") == null)
  }

  test("foreachBatch alert writer persists only alert rows, appends across batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-alerts").toFile
    val out = new java.io.File(dir, "alerts")
    try {
      val b1 = Seq(("a", "LOGIN_REQUIRED"), ("b", null))
        .toDF("id", "alert")
      val b2 = Seq(("c", "ACCOUNT_LOCKED")).toDF("id", "alert")
      AlertSink.writeAlerts(out.getPath)(b1, 0L)
      AlertSink.writeAlerts(out.getPath)(b2, 1L)
      val rows = spark.read.parquet(out.getPath)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(rows == Set("a" -> "LOGIN_REQUIRED", "c" -> "ACCOUNT_LOCKED"))
    } finally Fs.deleteRec(dir)
  }

  test("poison-pill stream death emits a STREAM_FAILED alert via the listener") {
    val dir = java.nio.file.Files.createTempDirectory("graft-alerts").toFile
    val listener = new AlertSink.AlertListener(dir.getPath)
    spark.streams.addListener(listener)
    try {
      val stream = EventsStream.replay(spark, TestSpark.sf)
      val q = stream.writeStream
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
          throw new RuntimeException("poison pill")
        }
        .start()
      intercept[Exception] { q.awaitTermination(120000) }
      // listener events are async — poll for the alert line
      val f = new java.io.File(dir, "alerts.jsonl")
      val deadline = System.currentTimeMillis() + 30000
      while (!f.exists() && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(f.exists(), "no alerts.jsonl written")
      val line = scala.io.Source.fromFile(f, "UTF-8").getLines().next()
      assert(line.contains("\"alert\":\"STREAM_FAILED\""), line)
      assert(line.contains("poison pill"), line)
    } finally {
      spark.streams.removeListener(listener)
      Fs.deleteRec(dir)
      TestSpark.housekeeping()
    }
  }
}
