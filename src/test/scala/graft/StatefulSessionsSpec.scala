package graft

import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{ClosedSession, SessionEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** flatMapGroupsWithState custom sessionization under a real streaming
  * query: gap-closed sessions emit as the stream advances; open sessions
  * close via event-time timeout when the watermark passes. */
class StatefulSessionsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("gap closes a session and a new one opens; timeout flushes the last") {
    implicit val s = spark
    val stream = MemoryStream[SessionEvent](spark)
    val q = StatefulSessions.sessions(stream.toDS())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      stream.addData(
        SessionEvent(1, t("2024-01-01 10:00:00"), 1.0),
        SessionEvent(1, t("2024-01-01 10:10:00"), 2.0))
      q.processAllAvailable()
      // 90 min later: gap > 30 min -> first session closes, second opens
      stream.addData(SessionEvent(1, t("2024-01-01 11:40:00"), 5.0))
      q.processAllAvailable()
      // push watermark far ahead so the open session times out
      stream.addData(SessionEvent(2, t("2024-01-01 15:00:00"), 9.0))
      q.processAllAvailable()
      stream.addData(SessionEvent(2, t("2024-01-01 18:00:00"), 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sessions_out").as[ClosedSession].collect()
      .sortBy(r => (r.user_id, r.session_start.getTime))
    val first = rows.find(r => r.user_id == 1 && r.reason == "gap").get
    assert(first.n_events == 2 && first.sum_value == 3.0)
    assert(first.session_start == t("2024-01-01 10:00:00"))
    assert(first.session_end == t("2024-01-01 10:10:00"))
    val timedOut = rows.filter(r => r.user_id == 1 && r.reason == "timeout")
    assert(timedOut.exists(r => r.n_events == 1 && r.sum_value == 5.0))
  }

  test("event cap closes a session mid-stream") {
    implicit val s = spark
    val stream = MemoryStream[SessionEvent](spark)
    val q = StatefulSessions.sessions(stream.toDS())
      .writeStream.format("memory").queryName("sessions_cap_out")
      .outputMode("append").start()
    try {
      // 100 events 1s apart -> cap fires at MaxEvents
      val evs = (0 until 120).map(i =>
        SessionEvent(7, new Timestamp(t("2024-01-01 10:00:00").getTime + i * 1000L), 1.0))
      stream.addData(evs)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sessions_cap_out").as[ClosedSession].collect()
    assert(rows.exists(r => r.reason == "cap" && r.n_events == StatefulSessions.MaxEvents))
  }
}
