package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: STEADY-STATE endurance of the nightly append cadence (r10
  * verdict item 7 — LayoutAppendProbe measured ONE night; this measures
  * a month of them). 32 consecutive nightly appends into the
  * time-series layout (the fragmentation-SENSITIVE shape: multi-file
  * buckets cede the reported per-bucket sort, so the consumer window
  * pays a per-task in-bucket sort that grows with files-per-bucket),
  * with `compactIfFragmented(maxFiles = 8)` driving the maintenance
  * cadence exactly as a real ingest job would — no wall-clock guesswork.
  *
  * Per night: appendOnce(tag = night-N) timed → consumer query (the
  * sessionize window shape that rides this layout) timed fresh →
  * fpb observable → compactIfFragmented timed. Expected: fpb cycles
  * 1→8 and the compaction fires exactly ⌊32/8⌋ = 4 times; query latency
  * tracks fpb inside the measured fragmentation envelope (r10: +28–34 %
  * at fpb=2 on sf96 q5/asof) and snaps back after each compact; append
  * cost stays flat (batch-proportional, never corpus-proportional).
  * End state: base + 32 nights ≡ the full raw table, exactly.
  *
  * Usage: runMain graft.tools.AppendEnduranceProbe [dir] [nights]
  */
object AppendEnduranceProbe {
  private def timed[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf12")
    val nights = args.lift(1).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.layouts.Bucketed
    import graft.Tables

    val events = Tables.events(spark, dir)
    val evBuckets = Bucketed.defaultBuckets(dir, "events")
    val nightOf = pmod(xxhash64(col("event_id")), lit(64))

    Bucketed.invalidate(spark, "endur_")
    val (tBase, Seq(evT)) = timed(Bucketed.ensure(spark, dir, Seq(
      Bucketed.Spec("endur_events", events.filter(nightOf >= nights),
        "user_id", srcTables = Seq("events"),
        sortCols = Seq("user_id", "ts", "event_id"))), evBuckets))
    println(f"ENDUR base build: $tBase%7.2f s  buckets=$evBuckets dir=$dir")

    // the consumer shape this layout carries: per-user session windows
    // (lag + running sum over (user_id, ts)) — FRESH DataFrame per
    // timing (a reused instance replays its materialized exchanges)
    def consumer(): Long = {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spark.table(evT)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("ns", when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1).otherwise(0))
        .withColumn("sid", sum(col("ns")).over(run))
        .groupBy(col("user_id"), col("sid")).count()
        .count()
    }
    consumer() // plan/codegen warmup on the base layout

    var compacts = 0
    for (n <- 0 until nights) {
      val (tA, _) = timed(Bucketed.appendOnce(spark, s"night-$n",
        Seq(evT -> events.filter(nightOf === n))))
      val fpb = Bucketed.maxFilesPerBucket(spark, Seq(evT))
      val (tQ, _) = timed(consumer())
      val (tC, ran) = timed(Bucketed.compactIfFragmented(spark, Seq(evT), maxFiles = 8))
      if (ran) {
        compacts += 1
        val (tQc, _) = timed(consumer())
        println(f"ENDUR night=$n%2d append=$tA%6.2f s fpb=$fpb%2d query=$tQ%6.2f s " +
          f"COMPACT=$tC%6.2f s query_post=$tQc%6.2f s")
      } else
        println(f"ENDUR night=$n%2d append=$tA%6.2f s fpb=$fpb%2d query=$tQ%6.2f s")
    }
    println(s"ENDUR compacts=$compacts (expect ${nights / 8})")
    // exactness after a month of nights: base + 32 appends ≡ raw table
    val got = spark.table(evT).count()
    val want = events.count()
    println(s"ENDUR rows: layout=$got raw=$want ${if (got == want) "OK" else "MISMATCH"}")
    spark.stop()
    if (got != want) sys.exit(1)
  }
}
