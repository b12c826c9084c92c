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

  test("cross-batch late event merges into the open session without regressing state") {
    implicit val s = spark
    val stream = MemoryStream[SessionEvent](spark)
    val q = StatefulSessions.sessions(stream.toDS())
      .writeStream.format("memory").queryName("sessions_late_out")
      .outputMode("append").start()
    try {
      // batch 1: open session [10:05, 10:10]; watermark advances to 10:00
      stream.addData(
        SessionEvent(3, t("2024-01-01 10:05:00"), 1.0),
        SessionEvent(3, t("2024-01-01 10:10:00"), 2.0))
      q.processAllAvailable()
      // batch 2: LATE events inside the 10-min watermark — 10:07 (older
      // than lastTs) must merge without regressing lastTs/timeout; 10:02
      // (older than session start) widens the session backward
      stream.addData(
        SessionEvent(3, t("2024-01-01 10:07:00"), 10.0),
        SessionEvent(3, t("2024-01-01 10:02:00"), 0.5))
      q.processAllAvailable()
      // batch 3: 10:39 is within gap of lastTs=10:10 (29 min) but NOT of a
      // regressed lastTs=10:07 (32 min) — a regression would wrongly close
      // the session here instead of extending it
      stream.addData(SessionEvent(3, t("2024-01-01 10:39:00"), 4.0))
      q.processAllAvailable()
      // far-future event on another key pushes the watermark -> timeout
      stream.addData(SessionEvent(4, t("2024-01-01 15:00:00"), 9.0))
      q.processAllAvailable()
      stream.addData(SessionEvent(4, t("2024-01-01 18:00:00"), 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sessions_late_out").as[ClosedSession].collect()
      .filter(_.user_id == 3)
    // everything merged into ONE session: widened start, no spurious gap close
    assert(rows.length == 1, rows.mkString(";"))
    val sess = rows.head
    assert(sess.reason == "timeout")
    assert(sess.session_start == t("2024-01-01 10:02:00"))   // widened backward
    assert(sess.session_end == t("2024-01-01 10:39:00"))
    assert(sess.n_events == 5 && sess.sum_value == 17.5)
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
