package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** K6 alert sink (SURVEY §2.2) — the reference emails operator alerts
  * on three page sentinels (`support/email.js:15-21`; LOGIN_REQUIRED
  * at `is-login-required.js:8-15`, SUSPICIOUS_ATTEMPT / ACCOUNT_LOCKED
  * at `login.js:43-51`) and implicitly on job death. Spark-first the
  * alert is a ROW in a durable alert table plus a job-level listener;
  * the email/SendGrid transport is the offline boundary, exactly as S3
  * is for ObjectSink — the engine-side artifact is the alert row, and
  * any mailer tails the table.
  *
  * Two halves:
  *   - row-level: [[alertFor]] maps page content to the first matching
  *     sentinel's alert code (the reference checks in order and stops
  *     at the first hit); oracle-gated through q_alert_rows.
  *   - job-level: [[AlertListener]] — a `StreamingQueryListener` that
  *     appends a STREAM_FAILED alert line when a streaming query dies
  *     (the ST8 poison-pill path), closing the circuit-breaker story:
  *     the breaker stops the job, the listener tells a human.
  */
object AlertSink {

  /** Sentinel → alert code, in the reference's check order. */
  val sentinels: Seq[(String, String)] = Seq(
    "Login • Instagram" -> "LOGIN_REQUIRED",
    "Suspicious Login Attempt" -> "SUSPICIOUS_ATTEMPT",
    "Your Account Has Been Temporarily Locked" -> "ACCOUNT_LOCKED")

  /** First matching sentinel's alert code, else NULL — a codegen'd
    * CASE chain, no UDF. */
  def alertFor(page: Column): Column =
    sentinels.foldRight(lit(null).cast("string")) {
      case ((needle, code), rest) =>
        when(page.contains(needle), lit(code)).otherwise(rest)
    }

  /** Append a batch's alert rows (alert IS NOT NULL) to the durable
    * alert table — usable directly as a foreachBatch sink.
    *
    * CARDINALITY CONTRACT (why coalesce(1) is safe): alerts ≪ rows —
    * a sentinel fires on the rare login-wall/poison page, so a batch
    * contributes a handful of alert rows at most and one output file
    * beats a directory of empties. The coalesce(1) would be a
    * single-task funnel ONLY under a sentinel storm across a wide
    * batch; if alerts ever became O(rows), drop the coalesce and let
    * the write inherit the batch's partitioning. */
  def writeAlerts(alertDir: String)(batch: DataFrame, id: Long): Unit =
    batch.filter(col("alert").isNotNull)
      .coalesce(1).write.mode("append").parquet(alertDir)

  /** Job-level failure alerting: a streaming query that terminates
    * WITH an exception appends one STREAM_FAILED line to
    * `<alertDir>/alerts.jsonl`. Plain file I/O on the listener thread
    * — the dying session must not be asked to run jobs — and append-
    * mode, so alerts survive across restarts the way an inbox does. */
  final class AlertListener(alertDir: String) extends StreamingQueryListener {
    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = ()
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      e.exception.foreach { reason =>
        val dir = new java.io.File(alertDir)
        dir.mkdirs()
        val line = s"""{"alert":"STREAM_FAILED","query":"${e.id}","reason":${
          jsonStr(reason.takeWhile(_ != '\n').take(500))}}\n"""
        java.nio.file.Files.write(
          java.nio.file.Paths.get(alertDir, "alerts.jsonl"),
          line.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
      }
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
