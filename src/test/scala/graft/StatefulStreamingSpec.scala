package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.streaming.EventsStream
import graft.streaming.EventsStream.{SessionAssignment, SessionEvent}

class StatefulStreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("flatMapGroupsWithState sessionization carries state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val MIN = 60L * 1000000
    val ms = MemoryStream[SessionEvent]
    val q = ms.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        EventsStream.sessionizeGroup)
      .writeStream.format("memory").queryName("sessions").outputMode("append")
      .start()
    // batch 1: two events 5 min apart (one session), then a 40-min gap
    ms.addData(SessionEvent(1, 0), SessionEvent(1, 5 * MIN), SessionEvent(1, 45 * MIN))
    q.processAllAvailable()
    // batch 2: 10 min after batch 1's last event → SAME session (state
    // carried); then a 2h gap → third session. Second user independent.
    ms.addData(SessionEvent(1, 55 * MIN), SessionEvent(1, 175 * MIN), SessionEvent(2, 0))
    q.processAllAvailable(); q.stop()

    val rows = spark.table("sessions").as[SessionAssignment]
      .collect().sortBy(a => (a.user_id, a.ts_us)).toSeq
    assert(rows == Seq(
      SessionAssignment(1, 0, 1), SessionAssignment(1, 5 * MIN, 1),
      SessionAssignment(1, 45 * MIN, 2), SessionAssignment(1, 55 * MIN, 2),
      SessionAssignment(1, 175 * MIN, 3), SessionAssignment(2, 0, 1)))
  }
}
