package graft.streaming

import graft.Tables
import graft.layouts.{Bucketed, LayoutUtil}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** STREAM → LAYOUT ingest, end to end (r10 verdict item 6 productized
  * into a driver-oracled surface): a Structured Streaming query whose
  * sink is `Bucketed.foreachBatchInto` — every micro-batch lands in the
  * resident bucketed layout as an exactly-once named batch
  * (`si-<batchId>`), so the layout equals base ∪ streamed-deltas no
  * matter how the source is micro-batched, how often the query is
  * restarted, or how many times the registry row re-runs:
  *
  *  - batch boundaries don't matter: content is the union of file
  *    slices, each processed once (checkpoint) and appended once
  *    (stamp);
  *  - restarts don't matter: a replayed last batch re-fires the
  *    foreachBatch body with the SAME batchId and hits its stamp
  *    (LayoutLifecycleSpec injects exactly that crash);
  *  - re-runs don't matter: the completed checkpoint yields no new
  *    batches, and even a wiped checkpoint could only re-offer tags
  *    that are already stamped.
  *
  * The source/checkpoint/layout triple is keyed by ONE content
  * signature of the raw events table, so regenerated testdata rotates
  * all three together — a stale checkpoint can never starve a fresh
  * layout. The ingested layout is the TIME-SERIES shape (bucketed by
  * user_id, sorted (user_id, ts, event_id)), so the consumer
  * aggregation in the `stream_layout_ingest` registry row runs
  * zero-exchange off the scan, multi-file buckets and all. */
object StreamIngest {

  /** Ensure the stream-ingested events layout for `dir` exists and is
    * fully caught up; returns the qualified table name. Base = 3/4 of
    * events (batch build); the remaining 1/4 arrives through a real
    * file-source streaming query, 3 source files under
    * maxFilesPerTrigger=1 → ≥ 3 separate micro-batches/appends. */
  def ensureStreamedLayout(s: SparkSession, dir: String): String = {
    import org.apache.hadoop.fs.Path
    val conf = s.sparkContext.hadoopConfiguration
    val events = Tables.events(s, dir)
    val isDelta = pmod(xxhash64(col("event_id")), lit(4)) === 0

    val t = Bucketed.ensure(s, dir, Seq(
      Bucketed.Spec("events_si", events.filter(!isDelta), "user_id",
        srcTables = Seq("events"), sortCols = Seq("user_id", "ts", "event_id"))),
      buckets = Bucketed.defaultBuckets(dir, "events")).head

    // one signature keys source dump + checkpoint (the layout's ensure
    // tag already covers the same bytes): regenerated data rotates them
    // together, so checkpointed progress always refers to THIS vintage
    val sig = LayoutUtil.cacheId(
      dir + "|" + LayoutUtil.dataSig(s"$dir/events.parquet") + "|si1")
    val root = s"/tmp/graft_stream_ingest_$sig"
    val done = new Path(s"$root/_GRAFT_INGESTED")
    if (graft.layouts.LayoutFs.exists(done, conf)) return t

    // stage the delta as 3 parquet files — the "arriving crawl files"
    val srcDir = s"$root/src"
    events.filter(isDelta).repartition(3)
      .write.mode("overwrite").parquet(srcDir)
    // the streaming query: file source → foreachBatch(appendOnce).
    // AvailableNow + maxFilesPerTrigger=1 drains the backlog as separate
    // micro-batches, then stops — the bounded form of a 24/7 ingest.
    val q = s.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .writeStream
      .foreachBatch(Bucketed.foreachBatchInto(s, "si", Seq(t -> (b => b))))
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.layouts.LayoutFs.touch(done, conf)
    t
  }
}
