package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: what band salting buys on a HOT band (layouts.RangeBanded,
  * r9 session 2). The skew model: within a matched band the merge join
  * forms |banded_band| × |probe_cands_band| pairs before the range
  * residual filters them, so an unsalted hot band concentrates that
  * product in ONE bucket's task; salt=k splits the banded rows across k
  * keys while each key sees the same probe candidates — total work
  * unchanged, wall-clock ÷ ~k (cores permitting).
  *
  * Fixture: synthetic events, `hotFrac` of rows uniform inside one hot
  * band (the peak hour), the rest spread over 48 bands; written to a
  * probe-owned dir so the persisted layout's content signature derives
  * from its true source file. Probe batch: rows inside the hot band,
  * window ≪ band (the residual kills most pairs — the join-shape cost
  * is the band-pair product, which is what salting attacks).
  *
  * Usage: runMain graft.tools.SaltProbe [nRows hotFrac nProbe salts...]
  */
object SaltProbe {
  def main(args: Array[String]): Unit = {
    val nRows = if (args.length > 0) args(0).toLong else 4000000L
    val hotFrac = if (args.length > 1) args(1).toDouble else 0.75
    val nProbe = if (args.length > 2) args(2).toInt else 100
    val salts = if (args.length > 3) args.drop(3).map(_.toInt).toSeq else Seq(1, 8)
    val W = 3600000000L // 1h band
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // fixture dir keyed by geometry at basis-point resolution — percent
    // truncation would serve a 0.75 fixture to a 0.755 run (and quantize
    // sub-1 % fractions to zero hot rows)
    val hotBp = math.round(hotFrac * 10000).toInt
    val dir = s"/tmp/graft_saltfix_${nRows}_$hotBp"
    val src = new java.io.File(s"$dir/events.parquet")
    if (!src.exists()) {
      val hotStart = 2L * W // the peak hour = band 2
      spark.range(nRows)
        .select(col("id").as("event_id"),
          expr(s"""cast(timestamp_micros(
              if(id % 10000 < $hotBp,
                 ${hotStart}L + (id * 7919) % ${W}L,
                 ((id * 104729) % 48) * ${W}L + (id * 7919) % ${W}L))
            as timestamp_ntz)""").as("ts"))
        .write.mode("overwrite").parquet(src.getAbsolutePath)
    }
    val events = spark.read.parquet(src.getAbsolutePath)
    // probe rows inside the hot band, tiny window (1% of the band)
    val probe = spark.range(nProbe)
      .select(col("id").as("p_id"),
        expr(s"cast(timestamp_micros(${2L * W}L + id * (${W}L div ${nProbe + 1})) " +
          "as timestamp_ntz)").as("p_ts"))
      .localCheckpoint()
    def measure(salt: Int, label: String): Unit = {
      val t = graft.layouts.RangeBanded.ensure(spark, dir, "saltev", events,
        "ts", W, srcTables = Seq("events"), buckets = 32,
        salt = salt, saltCol = "event_id")
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = graft.layouts.RangeBanded.rangeJoin(
            spark.table(t).hint("merge"), probe, "ts", "p_ts",
            windowMicros = W / 100, bandMicros = W, salt = salt)
          .count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"SALTPROBE n=$nRows hot=${(hotFrac * 100).toInt}%% salt=$salt%2d$label " +
        f"join_min=${times.map(_._1).min}%6.2f s " +
        f"all=${times.map(x => f"${x._1}%.2f").mkString(",")} rows=${times.head._2}")
    }
    salts.foreach(measure(_, ""))
    // the AUTO pick (r10): k from observed band occupancy at the stated
    // merge-task budget — the A/B answers "does the occupancy rule land on
    // the manual plateau?" (target 100 k hot-side rows/task, the
    // production-ish budget the ensureAuto scaladoc reasons from)
    val auto = graft.layouts.RangeBanded.autoSalt(
      events, "ts", W, targetRowsPerTask = 100000)
    measure(auto, " (auto)")
    spark.stop()
  }
}
