package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Det

/** Event-stream transformations (SURVEY §2-K), written once as pure
  * `DataFrame => DataFrame` so the SAME code runs in three places:
  *  - the driver's batch twins (StreamingOps queries, DuckDB-oracled),
  *  - Structured Streaming over `readStream`/MemoryStream (StreamingSpec),
  *  - any production `writeStream` job.
  * This identity is Spark's core streaming design point (one API, two
  * execution modes) and the reason the batch oracle meaningfully verifies
  * the streaming logic.
  *
  * 100 TB/stream-scale notes: tumbling/sliding aggregations shuffle on
  * (window, key) — state size is bounded by windows × keys, and the
  * watermark (applied in the streaming callers) is what lets the state
  * store evict. Session windows keep one open session per key. All
  * aggregates use map-side partial aggregation.
  */
object EventPipelines {

  /** op 63 — 1h tumbling counts + sum(value) per event_type. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))

  /** op 64 — 1h window sliding every 15 min, count + exact mean. */
  def slidingAvg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.davg(col("value")).as("avg_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("avg_value"))

  /** op 65 — session windows, native form: 30-min-gap sessions per user
    * (works in batch AND streaming; the batch twin in StreamingOps uses the
    * lag/gap/cumsum formulation instead so DuckDB can oracle it, and
    * StreamingSpec asserts the two agree). */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), Det.dsum(col("value")).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"), col("sum_value"))

  /** op 65 batch twin — sessionize via lag + gap flag + running sum: the
    * SAS BY-group formulation, and the only one DuckDB can mirror. */
  def sessionizeBatch(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(run))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        Det.dsum(col("value")).as("sum_value"))
  }

  /** op 66 batch twin — watermark semantics replayed over arrival order
    * (event_id = arrival sequence): an event is LATE iff its ts is older
    * than (max event-time seen so far − 10 min); late events are dropped
    * before aggregation, exactly what `withWatermark` does to state.
    *
    * The running max over the TOTAL arrival order is computed scalably:
    * a naive `Window.orderBy(event_id)` is a single-partition sort of the
    * whole table. Instead (1) chunk arrival order by `event_id DIV
    * chunkSize` and run the max within each chunk in parallel; (2) take
    * one max per chunk — bounded driver state, like zipWithIndex's
    * per-partition counts — prefix-scan them exclusively, broadcast back;
    * (3) running max = greatest(within-chunk running max, prefix max of
    * earlier chunks). Identical values to the naive form. Pick chunkSize ≈
    * √N to keep both the per-chunk work and the chunk-max table bounded;
    * at extreme N, add levels (chunk the chunk-maxes) instead of growing
    * either side. */
  def watermarkDropLate(events: DataFrame, chunkSize: Long = 4096L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = events.sparkSession
    val chunked = events.withColumn("chunk", expr(s"event_id DIV ${chunkSize}L"))
    val inChunk = Window.partitionBy(col("chunk")).orderBy(col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // type-agnostic over TIMESTAMP vs TIMESTAMP_NTZ (Timestamp/LocalDateTime)
    val chunkMaxes = chunked.groupBy(col("chunk")).agg(max(col("ts")).as("m"))
      .collect().map(r => (r.getLong(0), r.get(1))).sortBy(_._1)
    var run: Any = null
    val prefix = chunkMaxes.map { case (c, m) =>
      val p = run
      if (run == null || m.asInstanceOf[Comparable[Any]].compareTo(run) > 0) run = m
      org.apache.spark.sql.Row(c, p)
    }.toSeq
    val prefixDf = s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](scala.jdk.CollectionConverters.SeqHasAsJava(prefix).asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("chunk", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("prev_max", events.schema("ts").dataType, nullable = true))))
    chunked
      .withColumn("local_max", max(col("ts")).over(inChunk))
      .join(broadcast(prefixDf), "chunk")
      // greatest() skips nulls: first chunk has no predecessor
      .withColumn("wm", greatest(col("local_max"), col("prev_max")) - expr("INTERVAL 10 MINUTES"))
      .filter(col("ts") >= col("wm"))
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))
  }

  /** op 67 batch twin — stateful dedup: first arrival per (user_id,
    * event_type) in arrival order (streaming form:
    * `dropDuplicatesWithinWatermark`). */
  def dedupFirstArrival(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("event_id").asc)
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("event_id", "user_id", "event_type", "ts")
  }

  /** Stream⋈stream interval join (click attribution): purchases matched to
    * the same user's clicks within the preceding hour. The SAME join runs
    * under readStream with two-sided watermarks (StreamStreamJoinSpec) —
    * the time-bounded condition is what makes the streaming join state
    * evictable, and in batch it is the equi-conjunct + band filter shape
    * (never a pure theta join). */
  def clickAttribution(events: DataFrame): DataFrame = {
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
    p.join(c, col("user_id") === col("c_user") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
        col("click_ts") <= col("purchase_ts"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        col("purchase_ts"), col("click_ts"))
  }

  /** op 68 — stream⋈static enrichment: events joined to a broadcast user
    * dimension (works unmodified under readStream). */
  def staticEnrich(events: DataFrame, userDim: DataFrame): DataFrame =
    events
      .join(broadcast(userDim), col("user_id") === col("c_custkey"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("c_mktsegment").as("segment"))
}
