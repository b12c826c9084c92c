package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: the WIDE-WINDOW range-join trade at scale (r10 verdict
  * item 8 — `join_range_banded_wide` is oracled at sf0.01; this puts
  * NUMBERS on the scaladoc's "rebuild vs fan-out" advice). A query
  * whose window W outgrows the layout's band width B has two options:
  *
  *  - FAN-OUT: keep the layout, explode each probe row to the
  *    ⌈W/B⌉+1 candidate bands (probe-side cost only — the banded side
  *    is never shuffled or sorted either way);
  *  - REBUILD: re-ensure the layout at band = W and explode to 2 —
  *    pay a full banding write once, then every query probes minimally
  *    (wider bands also mean each candidate band holds W's worth of
  *    rows, so the residual-filter volume is similar; the saving is the
  *    probe explode + join fan-in).
  *
  * Protocol per window (W = 2.5×B and 10×B over 1 h bands): run the
  * fan-out arm on the 1 h layout, then ensure a band=W layout (build
  * timed) and run the 2-band arm; both arms must agree exactly (same
  * pair count). Probe = a fixed 1/1024 sample of signups — the layout's
  * design point (KB–MB probe batch vs corpus-resident banded side).
  * Candidate-key telemetry from RangeBanded.lastCandidateKeys.
  *
  * Usage: runMain graft.tools.WideWindowProbe [dir]
  */
object WideWindowProbe {
  private def timed[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }
  /** min-of-2 after a warmup; FRESH DataFrame per call (a reused
    * instance replays its materialized exchanges). */
  private def timed2(f: => Long): (Double, Long) = {
    f
    val (t1, a) = timed(f)
    val (t2, _) = timed(f)
    (math.min(t1, t2), a)
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
    import graft.layouts.RangeBanded
    import graft.Tables

    val HourMicros = 3600000000L
    val events = Tables.events(spark, dir)
    val probe = events.filter(col("event_type") === "signup")
      .filter(pmod(xxhash64(col("event_id")), lit(1024)) === 0)
      .select(col("event_id").as("signup_id"), col("ts").as("signup_ts"))
      .localCheckpoint() // fixed probe batch: its derivation must not re-run per arm
    println(s"WIDEWIN dir=$dir probe_rows=${probe.count()}")

    def arm(table: String, bandMicros: Long, windowMicros: Long): Long = {
      val banded = spark.table(table).filter(col("event_type") === "error")
        .select(col("band"), col("event_id").as("error_id"), col("ts").as("error_ts"))
        .hint("merge")
      RangeBanded.rangeJoin(banded, probe, "error_ts", "signup_ts",
        windowMicros, bandMicros).count()
    }

    // the resident 1 h layout (idempotent ensure — shared with the bench)
    val (tB1, t1h) = timed(RangeBanded.ensure(spark, dir, "events",
      events, "ts", HourMicros, Seq("events")))
    println(f"WIDEWIN layout band=1h ensure=$tB1%7.2f s (cache-hit if small)")

    for (mult <- Seq(1.0, 2.5, 10.0)) {
      val w = (HourMicros * mult).toLong
      // ARM A: fan-out on the 1 h layout
      val (tFan, nFan) = timed2(arm(t1h, HourMicros, w))
      val fanKeys = RangeBanded.lastCandidateKeys
      if (mult == 1.0) {
        println(f"WIDEWIN W=${mult}%4.1fh fanout: keys=$fanKeys%3d t=$tFan%7.2f s " +
          f"pairs=$nFan (baseline; no rebuild arm)")
      } else {
        // ARM B: rebuild at band = W, probe with the minimal 2 bands
        // dot-free layout name (a '.' would split the table identifier)
        val (tBuild, tw) = timed(RangeBanded.ensure(spark, dir,
          s"events_w${(mult * 10).toInt}", events, "ts", w, Seq("events")))
        val (tRe, nRe) = timed2(arm(tw, w, w))
        val reKeys = RangeBanded.lastCandidateKeys
        val perQuerySaving = tFan - tRe
        val breakEven = if (perQuerySaving > 0) math.ceil(tBuild / perQuerySaving) else -1.0
        println(f"WIDEWIN W=${mult}%4.1fh fanout: keys=$fanKeys%3d t=$tFan%7.2f s " +
          f"pairs=$nFan | rebuild: build=$tBuild%7.2f s keys=$reKeys%3d " +
          f"t=$tRe%7.2f s pairs=$nRe | agree=${nFan == nRe} " +
          f"break_even_queries=$breakEven%5.0f")
        assert(nFan == nRe, s"arms disagree at W=${mult}h: $nFan vs $nRe")
      }
    }
    spark.stop()
  }
}
