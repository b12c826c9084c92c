package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scaling probe (the CROSSOVER.md convention for heavy-row
  * claims): run named registry rows TWICE per sf dir in one session —
  * run 1 also builds/refreshes the on-disk fixtures, run 2 is the warm
  * kernel — and publish min-of-2, plus the min-label propagation round
  * count for the clusters row (TextDedup.lastIters), because its cost is
  * rounds × per-round join and the flat-rounds claim is what makes its
  * scaling interpretable.
  *
  * Usage: runMain graft.tools.ScaleProbe [dir ...]
  *   SPARK_GRAFT_PROBE_ROWS=a,b,c (default llm_semdedup,llm_dedup_clusters)
  *   SPARK_GRAFT_CPUS (default 32 — the probe regime)
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/tmp/graft_sf6d", "/tmp/graft_sf12d")
    val names = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROWS",
      "llm_semdedup,llm_dedup_clusters").split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- dirs; name <- names) {
      val fn = graft.SparkEntry.queries(name)
      val runs = (1 to 2).map { _ =>
        val before = spark.sparkContext.getPersistentRDDs.keySet
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs
          .filter { case (id, _) => !before.contains(id) }
          .values.foreach(_.unpersist(blocking = false))
        (t, n)
      }
      val iters = if (name == "llm_dedup_clusters")
        s"  cc_rounds=${graft.etl.TextDedup.lastIters}" else ""
      println(f"PROBE $name%-20s $dir%-18s " +
        f"run1=${runs(0)._1}%7.2f run2=${runs(1)._1}%7.2f " +
        f"min2=${runs.map(_._1).min}%7.2f s rows=${runs(1)._2}$iters")
    }
    spark.stop()
  }
}
