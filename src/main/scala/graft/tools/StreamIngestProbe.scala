package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: throughput of the exactly-once stream → layout ingest at
  * scale (r11 — StreamIngest is driver-oracled at sf0.01; this measures
  * the path on a 12 M-row corpus). ensureStreamedLayout builds the 3/4
  * base batch-side, then drains the 3 M-row delta through the
  * foreachBatch(appendOnce) sink as 3 micro-batches; the second call is
  * the steady-state no-op (derived catch-up check short-circuits).
  *
  * Usage: runMain graft.tools.StreamIngestProbe [dir]
  */
object StreamIngestProbe {
  private def timed[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf12")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    graft.layouts.Bucketed.invalidate(spark, "events_si")
    val (tFull, t) = timed(graft.streaming.StreamIngest.ensureStreamedLayout(spark, dir))
    val rows = spark.table(t).count()
    val want = graft.Tables.events(spark, dir).count()
    val deltaRows = want / 4
    println(f"SIPROBE full (base build + 3-batch stream): $tFull%7.2f s " +
      f"rows=$rows raw=$want ${if (rows == want) "OK" else "MISMATCH"}")
    println(f"SIPROBE streamed delta ≈ $deltaRows rows")
    val (tNoop, _) = timed(graft.streaming.StreamIngest.ensureStreamedLayout(spark, dir))
    println(f"SIPROBE steady-state no-op re-ensure: $tNoop%7.2f s")
    // consumer latency off the streamed (multi-file-bucket) layout
    val (tQ, n) = timed(spark.table(t).groupBy("user_id").count().count())
    println(f"SIPROBE consumer per-user agg: $tQ%7.2f s groups=$n")
    spark.stop()
    if (rows != want) sys.exit(1)
  }
}
