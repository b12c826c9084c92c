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
    * earlier chunks). Identical values to the naive form.
    *
    * chunkSize is DERIVED from the row count (≈ ∛N, floored at 1024) unless
    * explicitly given, and the prefix over the chunk maxima is computed by
    * `exclusivePrefixMax` — a recursive within-group-window + group-maxima
    * scheme whose driver state is bounded by the fanout at EVERY N and
    * every N/chunkSize ratio (the "add levels at extreme N" promise,
    * implemented): the driver only ever materializes the final ≤fanout-row
    * base level; all other levels stay distributed. */
  def watermarkDropLate(events: DataFrame, chunkSize: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = events.count() // metadata-cheap on parquet; one pass otherwise
    val cs =
      if (chunkSize > 0) chunkSize
      else math.max(1024L, math.ceil(math.cbrt(n.toDouble)).toLong)
    val chunked = events.withColumn("chunk", expr(s"event_id DIV ${cs}L"))
    val inChunk = Window.partitionBy(col("chunk")).orderBy(col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val chunkMaxes = chunked.groupBy(col("chunk")).agg(max(col("ts")).as("m"))
      .select(col("chunk").as("id"), col("m"))
    val prefixDf = exclusivePrefixMax(chunkMaxes)._1.withColumnRenamed("id", "chunk")
    // ~n/cs chunk rows: broadcast while that is clearly small, else let the
    // planner shuffle the prefix side (the downstream agg shuffles anyway)
    val prefSide = if (n / cs < 100000L) broadcast(prefixDf) else prefixDf
    chunked
      .withColumn("local_max", max(col("ts")).over(inChunk))
      .join(prefSide, "chunk")
      // greatest() skips nulls: first chunk has no predecessor
      .withColumn("wm", greatest(col("local_max"), col("prev_max")) - expr("INTERVAL 10 MINUTES"))
      .filter(col("ts") >= col("wm"))
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))
  }

  /** Exclusive running max over an (id: long, m: orderable) table: for each
    * id, the max of `m` over all STRICTLY smaller ids (null when none).
    *
    * Distributed with bounded driver state: each level computes the
    * within-group exclusive prefix via a window partitioned by `id DIV
    * fanout` (never a global single-partition sort), reduces the table
    * fanout× to one max per group, and recurses; only the final ≤fanout-row
    * level is collected and prefix-scanned on the driver (the same bounded
    * pattern as zipWithIndex's per-partition counts). Depth is
    * log_fanout(rows) — 3 levels cover 10¹² chunks at the default fanout.
    *
    * Returns (prefix table, driver-collected row count) — the second value
    * exists for the boundedness spec and is ≤ fanout by construction. */
  private[graft] def exclusivePrefixMax(tbl: DataFrame, fanout: Long = 4096L): (DataFrame, Long) = {
    import org.apache.spark.sql.expressions.Window
    require(fanout >= 2, s"fanout must be >= 2, got $fanout")
    val s = tbl.sparkSession
    val cnt = tbl.count()
    if (cnt <= fanout) {
      // base case: the only driver materialization, ≤ fanout rows.
      // type-agnostic over TIMESTAMP vs TIMESTAMP_NTZ (Timestamp/LocalDateTime)
      val rows = tbl.collect().map(r => (r.getLong(0), r.get(1))).sortBy(_._1)
      var run: Any = null
      val prefix = rows.map { case (i, m) =>
        val p = run
        if (run == null || m.asInstanceOf[Comparable[Any]].compareTo(run) > 0) run = m
        org.apache.spark.sql.Row(i, p)
      }.toSeq
      val df = s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(prefix).asJava),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", LongType, nullable = false),
          org.apache.spark.sql.types.StructField("prev_max", tbl.schema(1).dataType, nullable = true))))
      (df, cnt)
    } else {
      val grouped = tbl.withColumn("grp", expr(s"id DIV ${fanout}L"))
      val inGrp = Window.partitionBy(col("grp")).orderBy(col("id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val withLocal = grouped.withColumn("prev_in_grp", max(col("m")).over(inGrp))
      val grpMaxes = grouped.groupBy(col("grp")).agg(max(col("m")).as("m"))
        .select(col("grp").as("id"), col("m"))
      val (grpPrefix, collected) = exclusivePrefixMax(grpMaxes, fanout)
      val joined = withLocal.join(
        grpPrefix.select(col("id").as("grp"), col("prev_max").as("grp_prev")), "grp")
      // greatest() skips nulls: global-first group has no predecessor at all
      (joined.select(col("id"),
        greatest(col("prev_in_grp"), col("grp_prev")).as("prev_max")), collected)
    }
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

  /** AS-OF enrichment of an event stream from a static slowly-changing
    * dimension: each event takes the dim row with the greatest
    * `dimTs` ≤ event `ts` for its key (left semantics — no prior dim row
    * → null attributes). An as-of join per se needs per-key ORDERING of
    * the probe side, which an unbounded stream cannot provide; the
    * streaming-safe formulation moves the order to the STATIC side —
    * versioned ONCE with lead() into [dimTs, valid_to) intervals, the
    * SCD2 range-lookup — so the stream pays a plain broadcast left join
    * with a point-in-interval residual, exactly one match per (event,
    * key) by interval disjointness. Stream-static joins of this shape
    * are legal in Structured Streaming (the static side is re-broadcast
    * per micro-batch), so this code runs unchanged under readStream
    * (StreamingSpec pins batch == streaming).
    *
    * `dim` must be unique on (dimKey, dimTs) — collapse ties
    * deterministically first (the registry row keeps the max-key order
    * row per day); duplicate version rows would otherwise each match.
    *
    * 100 TB notes: the dim is broadcast-sized by the SCD contract
    * (versions of a reference table); the stream side never shuffles —
    * per-event cost is one hash probe + interval check.
    *
    * NON-BROADCASTABLE dim fallback (r9 verdict item 6): a versioned
    * dimension past executor-broadcast size (hundreds of millions of
    * version rows) passes `broadcastDim = false` — the join becomes a
    * per-micro-batch SHUFFLED equi join on the key (with the interval
    * residual), which stream-static joins support: each micro-batch
    * shuffles only ITS OWN rows (batch-bounded, not stream-bounded) plus
    * the dim side. To stop re-shuffling the dim every micro-batch,
    * resident-format it: persist the VERSIONED dim (valid_to
    * precomputed) as a `Bucketed` layout on the key and pass
    * `spark.table(...)` in — the static side's exchange then disappears
    * into the bucketed scan, the same storage answer the batch as-of
    * family uses (Joins.bucketedEvents / join_asof_colocated).
    * StreamingSpec pins the fallback's stream ≡ batch ≡ broadcast-form
    * agreement and the no-broadcast plan shape. */
  def asofEnrich(events: DataFrame, dim: DataFrame,
      dimKey: String, dimTs: String,
      eventKey: String = "user_id", eventTs: String = "ts",
      broadcastDim: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(dimKey)).orderBy(col(dimTs).asc)
    val versioned = dim.withColumn("valid_to", lead(col(dimTs), 1).over(w))
    val dimSide = if (broadcastDim) broadcast(versioned) else versioned
    events.join(dimSide,
      col(eventKey) === col(dimKey) &&
        col(eventTs) >= col(dimTs) &&
        (col("valid_to").isNull || col(eventTs) < col("valid_to")),
      "left")
      .drop("valid_to")
  }
}
