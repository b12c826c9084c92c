package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe for the r8 embed_neardup corpus-profile ROUTER: run
  * `llm_embed_neardup` on the spread-mode corpora (mid-similarity
  * background — the profile whose r7 guard used to fail-fast) and
  * verify the routed IVF-cell path (a) completes, (b) recovers every
  * planted (vec_id, vec_id+1e6) mutant pair, and (c) scales ≤ ~2.2×
  * per 2× data (the CROSSOVER.md convention: two runs per dir,
  * min-of-2 published; run 1 warms fixtures/JIT).
  *
  * Usage: runMain graft.tools.NeardupRouteProbe [dir ...]
  *   (default /tmp/graft_sf6s /tmp/graft_sf12s)
  */
object NeardupRouteProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/tmp/graft_sf6s", "/tmp/graft_sf12s")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries("llm_embed_neardup")
    for (dir <- dirs) {
      val runs = (1 to 2).map { _ =>
        val before = spark.sparkContext.getPersistentRDDs.keySet
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val t = (System.nanoTime() - t0) / 1e9
        // release this run's checkpoint blocks (the ScaleProbe hygiene):
        // without it sf24s's run2 measured 356 s vs run1's 175 — block-
        // manager pressure from earlier dirs' accumulated checkpoints
        spark.sparkContext.getPersistentRDDs
          .filter { case (id, _) => !before.contains(id) }
          .values.foreach(_.unpersist(blocking = false))
        (t, n)
      }
      // recall check: every base vec with id % 100 == 0 got a planted
      // mutant at +1e6; each such pair is cosine ≥ 0.97 and must appear
      val res = fn(spark, dir)
        .filter(col("vec_b") === col("vec_a") + 1000000L)
        .select(col("vec_a")).distinct()
      val expected = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("vec_a")).distinct()
      val nExpected = expected.count()
      val nMissing = expected.join(res, Seq("vec_a"), "left_anti").count()
      println(f"NEARDUP_ROUTE $dir%-18s run1=${runs(0)._1}%7.2f " +
        f"run2=${runs(1)._1}%7.2f min2=${runs.map(_._1).min}%7.2f s " +
        f"rows=${runs(1)._2} planted=$nExpected missing=$nMissing")
    }
    spark.stop()
  }
}
