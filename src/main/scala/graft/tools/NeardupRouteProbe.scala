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
  * Usage: runMain graft.tools.NeardupRouteProbe [theta=X] [dir ...]
  *   (default θ = 0.9, the registry row's threshold;
  *    default dirs /tmp/graft_sf6s /tmp/graft_sf12s)
  * r9: `theta=0.95`+ gives the PLANTED-ONLY-OUTPUT form — background
  * pairs sit below it, so the run isolates the kernel's scaling from
  * output-quadratic pair mass (the r8 verdict's unseparated 2.49×/2×).
  */
object NeardupRouteProbe {
  def main(args: Array[String]): Unit = {
    val theta = args.collectFirst { case a if a.startsWith("theta=") =>
      a.stripPrefix("theta=").toDouble }.getOrElse(0.9)
    val dirArgs = args.filterNot(_.startsWith("theta=")).toSeq
    val dirs = if (dirArgs.nonEmpty) dirArgs
      else Seq("/tmp/graft_sf6s", "/tmp/graft_sf12s")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the registry row's corpus construction (embeddings + the planted
    // +1e6 perturbed copies), run through the θ-parameterized library form
    val fn: (SparkSession, String) => org.apache.spark.sql.DataFrame =
      (s, dir) => {
        val base = graft.Tables.embeddings(s, dir)
          .select(col("vec_id"),
            graft.functions.VectorOps.toDouble(col("embedding")).as("v"))
        val planted = base.filter(col("vec_id") % 100 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            transform(col("v"), x => x * 0.9 + 0.02).as("v"))
        graft.operators.LlmOps.embedNeardupPairs(
          base.unionByName(planted), theta)
      }
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
      println(f"NEARDUP_ROUTE $dir%-18s theta=$theta%.2f run1=${runs(0)._1}%7.2f " +
        f"run2=${runs(1)._1}%7.2f min2=${runs.map(_._1).min}%7.2f s " +
        f"rows=${runs(1)._2} planted=$nExpected missing=$nMissing")
    }
    spark.stop()
  }
}
