package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Stream-stream interval join — the advanced Structured Streaming shape
  * beyond SURVEY §2-K's stream-static op: purchases joined to the same
  * user's clicks within the preceding hour, both sides watermarked so the
  * join state is evictable (the unbounded-state trap of naive
  * stream-stream joins). */
class StreamStreamJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("purchases x clicks interval join with two-sided watermarks") {
    val clicks = MemoryStream[Ev](spark)
    val purchases = MemoryStream[Ev](spark)
    val c = clicks.toDF()
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "30 minutes")
    val p = purchases.toDF()
      .select(col("event_id"), col("user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "30 minutes")
    val joined = p.join(c,
      col("user_id") === col("c_user") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
        col("click_ts") <= col("purchase_ts"))
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      clicks.addData(
        Ev(1, t("2024-01-01 10:00:00"), 1, "click", 0),
        Ev(2, t("2024-01-01 10:30:00"), 1, "click", 0),
        Ev(3, t("2024-01-01 08:00:00"), 2, "click", 0))  // too old for the purchase below
      purchases.addData(
        Ev(10, t("2024-01-01 10:45:00"), 1, "purchase", 9.99),
        Ev(11, t("2024-01-01 10:50:00"), 2, "purchase", 5.00))
      q.processAllAvailable()
      // advance both watermarks so results finalize
      clicks.addData(Ev(4, t("2024-01-01 13:00:00"), 9, "click", 0))
      purchases.addData(Ev(12, t("2024-01-01 13:00:00"), 9, "purchase", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("ssj_out")
      .select("event_id", "click_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString))
    // purchase 10 matches both in-window clicks of user 1; purchase 11's
    // only click is outside the 1h window; purchase 12 matches the 13:00 click
    assert(rows.count(_._1 == 10L) == 2)
    assert(!rows.exists(_._1 == 11L))
    assert(rows.count(_._1 == 12L) == 1)
  }

  test("clickAttribution (the registry batch twin) runs as a streaming self-join") {
    val events = MemoryStream[Ev](spark)
    val out = graft.streaming.EventPipelines.clickAttribution(
      events.toDF().withWatermark("ts", "30 minutes"))
    val q = out.writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      events.addData(
        Ev(1, t("2024-01-01 10:00:00"), 1, "click", 0),
        Ev(2, t("2024-01-01 10:30:00"), 1, "click", 0),
        Ev(3, t("2024-01-01 08:00:00"), 2, "click", 0),
        Ev(10, t("2024-01-01 10:45:00"), 1, "purchase", 9.99),
        Ev(11, t("2024-01-01 10:50:00"), 2, "purchase", 5.00))
      q.processAllAvailable()
      events.addData(
        Ev(4, t("2024-01-01 13:00:00"), 9, "click", 0),
        Ev(12, t("2024-01-01 13:00:05"), 9, "purchase", 1.0),
        Ev(99, t("2024-01-01 16:00:00"), 8, "click", 0))  // watermark push
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("attr_out")
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 1L), (10L, 2L), (12L, 4L)))
  }
}
