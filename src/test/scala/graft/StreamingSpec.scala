package graft

import graft.streaming.EventPipelines
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp
import scala.jdk.CollectionConverters._

/** SURVEY §2-K streaming semantics: the EventPipelines transforms running
  * under Structured Streaming (MemoryStream), including the FIXTURES.md
  * stream_late scenario (watermark drops late rows in append mode), and
  * batch≡stream equivalence of the tumbling aggregation. */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

class StreamingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private val batchEvents = Seq(
    Ev(1, t("2024-01-01 10:05:00"), 1, "click", 1.0),
    Ev(2, t("2024-01-01 10:20:00"), 1, "click", 2.0),
    Ev(3, t("2024-01-01 11:10:00"), 2, "view", 3.0),
    Ev(4, t("2024-01-01 11:40:00"), 2, "view", 4.0),
    Ev(5, t("2024-01-01 12:30:00"), 1, "click", 5.0))

  test("tumbling counts: streaming (complete mode) == batch twin") {
    val stream = MemoryStream[Ev](spark)
    stream.addData(batchEvents.take(3))
    stream.addData(batchEvents.drop(3))
    val q = EventPipelines.tumblingCounts(stream.toDF())
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("tumbling_out")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val want = EventPipelines.tumblingCounts(batchEvents.toDF())
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("stream_late fixture: watermark drops a late row in append mode") {
    val stream = MemoryStream[Ev](spark)
    val agg = stream.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))
    val q = agg.writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    try {
      stream.addData(Ev(1, t("2024-01-01 10:00:00"), 1, "click", 1.0),
                     Ev(2, t("2024-01-01 10:05:00"), 1, "click", 1.0))
      q.processAllAvailable()
      // advance event time: watermark -> 10:50, finalizing the 10:00 window
      stream.addData(Ev(3, t("2024-01-01 11:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      // LATE: 09:40 is far behind the 10:50 watermark -> must be dropped
      stream.addData(Ev(4, t("2024-01-01 09:40:00"), 1, "click", 1.0))
      q.processAllAvailable()
      // advance again so any (wrongly) accepted late window would flush
      stream.addData(Ev(5, t("2024-01-01 12:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("late_out")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(2)))
    assert(rows.contains(("2024-01-01 10:00:00.0", 2L)))     // on-time window emitted
    assert(!rows.exists(_._1.startsWith("2024-01-01 09:40")))  // late row dropped
  }

  test("dropDuplicatesWithinWatermark: same event_id delivered twice emits once") {
    val stream = MemoryStream[Ev](spark)
    val dedup = stream.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = dedup.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      stream.addData(Ev(1, t("2024-01-01 10:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      stream.addData(Ev(1, t("2024-01-01 10:01:00"), 1, "click", 1.0),  // duplicate id
                     Ev(2, t("2024-01-01 10:02:00"), 1, "view", 2.0))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_out").select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L))
  }

  test("session_window (native) agrees with lag/cumsum sessionize on batch events") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val native = EventPipelines.sessionWindows(events)
      .select("user_id", "session_start", "n_events")
      .collect().map(r => (r.getLong(0), r.get(1).toString, r.getLong(2)))
    val twin = EventPipelines.sessionizeBatch(events)
      .select("user_id", "session_start", "n_events")
      .collect().map(r => (r.getLong(0), r.get(1).toString, r.getLong(2)))
    assert(native.toSet == twin.toSet && twin.nonEmpty)
  }

  test("file-source streaming: readStream over the events parquet == batch twin") {
    // stage the parquet into a stream-source dir (a file source treats each
    // new file as a micro-batch)
    val srcDir = java.nio.file.Files.createTempDirectory("graft_stream_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      srcDir.resolve("events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // ts arrives as a raw ns long (NANOS testdata vintage) or a timestamp
    // (MICROS vintage) — normalize exactly like Tables.events
    val rawSchema = spark.read.parquet(srcDir.toString).schema
    val tsExpr =
      if (rawSchema("ts").dataType == org.apache.spark.sql.types.LongType)
        "cast(timestamp_micros(ts div 1000) as timestamp_ntz)"
      else "cast(ts as timestamp_ntz)"
    val stream = spark.readStream.schema(rawSchema).parquet(srcDir.toString)
      .withColumn("ts", org.apache.spark.sql.functions.expr(tsExpr))
    val q = EventPipelines.tumblingCounts(stream)
      .writeStream.format("memory").queryName("file_stream_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("file_stream_out").collect()
      .map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val want = EventPipelines.tumblingCounts(
        Tables.events(spark, "/root/testdata/sf0.001")).collect()
      .map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("stream-static AS-OF enrich: the SCD2 range-lookup formulation runs " +
      "under readStream and equals the batch twin") {
    val stream = MemoryStream[Ev](spark)
    stream.addData(batchEvents.take(3))
    stream.addData(batchEvents.drop(3))
    // three versions for user 1 (the middle one superseded at 12:00),
    // one for user 2, none matching before user 2's first event
    val dim = Seq(
      (1L, t("2024-01-01 09:00:00"), 100L, 10.0),
      (1L, t("2024-01-01 10:10:00"), 101L, 11.0),
      (1L, t("2024-01-01 12:00:00"), 102L, 12.0),
      (2L, t("2024-01-01 11:30:00"), 200L, 20.0)
    ).toDF("o_custkey", "o_orderdate", "asof_orderkey", "asof_totalprice")
    def run(events: org.apache.spark.sql.DataFrame) =
      EventPipelines.asofEnrich(events, dim, "o_custkey", "o_orderdate")
        .select(col("event_id"), col("asof_orderkey"))
    val q = run(stream.toDF())
      .writeStream.format("memory").queryName("asof_enrich_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = {
      val rs = df.collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      // exactly ONE output row per event — the interval-disjointness
      // property the formulation rests on; a Map alone would silently
      // swallow a duplicate match
      assert(rs.length == rs.map(_._1).distinct.length,
        s"an event matched more than one dim version: ${rs.toSeq}")
      rs.toMap
    }
    val got = rows(spark.table("asof_enrich_out"))
    // ev1 10:05 → 09:00 version (100); ev2 10:20 → 10:10 version (101);
    // ev3 11:10 → no user-2 version yet (null); ev4 11:40 → 200;
    // ev5 12:30 → 12:00 version (102)
    assert(got == Map(1L -> 100L, 2L -> 101L, 3L -> -1L, 4L -> 200L, 5L -> 102L),
      s"asof enrich rows: $got")
    assert(got == rows(run(batchEvents.toDF())), "stream != batch twin")

    // NON-BROADCASTABLE dim fallback (broadcastDim = false): same
    // results under readStream — each micro-batch pays a batch-bounded
    // shuffled join instead of a broadcast build
    val stream2 = MemoryStream[Ev](spark)
    stream2.addData(batchEvents)
    val q2 = EventPipelines.asofEnrich(stream2.toDF(), dim,
        "o_custkey", "o_orderdate", broadcastDim = false)
      .select(col("event_id"), col("asof_orderkey"))
      .writeStream.format("memory").queryName("asof_enrich_nb_out")
      .outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    assert(rows(spark.table("asof_enrich_nb_out")) == got,
      "non-broadcast fallback != broadcast form")
    // and the fallback genuinely does not broadcast: in a child session
    // with auto-broadcast off, the batch twin plans a shuffled join
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val nb = EventPipelines.asofEnrich(
      s2.createDataFrame(batchEvents.toDF().collect().toList.asJava, batchEvents.toDF().schema),
      s2.createDataFrame(dim.collect().toList.asJava, dim.schema),
      "o_custkey", "o_orderdate", broadcastDim = false)
    val p = nb.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastHashJoin") && !p.contains("BroadcastNestedLoop"),
      "fallback still broadcasts the dim:\n" + p)
  }

  test("stream-static enrich runs under readStream semantics (stream join static)") {
    val stream = MemoryStream[Ev](spark)
    stream.addData(batchEvents)
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY")).toDF("c_custkey", "c_mktsegment")
    val q = EventPipelines.staticEnrich(stream.toDF(), dim)
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val segs = spark.table("enrich_out").select("event_id", "segment")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(segs(1L) == "BUILDING" && segs(3L) == "MACHINERY" && segs.size == 5)
  }
}
