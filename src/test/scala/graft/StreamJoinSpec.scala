package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Stream-stream interval join with watermarks: clicks joined to the
  * same user's purchases within the preceding hour — the streaming twin
  * of Extras' q_asof_join, state bounded by both watermarks. */
class StreamJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("stream-stream interval join equals the batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000)
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp)]
    val c = clicks.toDF().toDF("user_id", "cts").withWatermark("cts", "2 hours")
    val b = buys.toDF().toDF("buser", "bts").withWatermark("bts", "2 hours")
    val joined = c.join(b,
      expr("user_id = buser AND bts BETWEEN cts - INTERVAL 1 HOUR AND cts"))
      .select(col("user_id"), col("cts"), col("bts"))
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()

    val clickData = Seq((1L, ts(60)), (1L, ts(180)), (2L, ts(60)))
    val buyData = Seq((1L, ts(30)), (1L, ts(170)), (2L, ts(300)))
    clicks.addData(clickData: _*); buys.addData(buyData: _*)
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("ssjoin").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
    val batch = clickData.toDF("user_id", "cts")
      .join(buyData.toDF("buser", "bts"),
        expr("user_id = buser AND bts BETWEEN cts - INTERVAL 1 HOUR AND cts"))
      .select(col("user_id"), col("cts"), col("bts")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty) // (1, t60, t30) and (1, t180, t170) at least
  }

  test("join state is bounded: rows behind both watermarks age out") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000)
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp)]
    val c = clicks.toDF().toDF("user_id", "cts").withWatermark("cts", "1 hour")
    val b = buys.toDF().toDF("buser", "bts").withWatermark("bts", "1 hour")
    val joined = c.join(b,
      expr("user_id = buser AND bts BETWEEN cts - INTERVAL 1 HOUR AND cts"))
      .select(col("user_id"), col("cts"), col("bts"))
    val q = joined.writeStream.format("memory").queryName("ssjoin_age")
      .outputMode("append").start()
    try {
      // batch 1: one matching pair for u1, then advance event time far
      // ahead on both sides so the watermark passes minute ~60
      clicks.addData((1L, ts(30)), (9L, ts(100000)))
      buys.addData((1L, ts(20)), (9L, ts(100000)))
      q.processAllAvailable()
      // batch 2: a pair for u2 planted entirely BEHIND the advanced
      // watermark — state for that region is gone and late input is
      // dropped, so no join row may appear (the bounded-state contract;
      // an unconstrained join would happily match them)
      clicks.addData((2L, ts(30)))
      buys.addData((2L, ts(20)))
      q.processAllAvailable()
      val users = spark.table("ssjoin_age").collect()
        .map(_.getLong(0)).toSet
      assert(users.contains(1L))
      assert(!users.contains(2L),
        "late rows behind both watermarks must not join (unbounded state?)")
    } finally q.stop()
  }
}
