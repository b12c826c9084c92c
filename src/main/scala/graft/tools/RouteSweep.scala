package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: sweep the cell fallback's probe width (asymmetric
  * multi-probe m) on the spread corpora — candidate generation +
  * exact-cosine verification only, mirroring the llm_embed_neardup
  * fallback's planted corpus, so the m choice is driven by measured
  * (time, planted-pair recall) pairs instead of guesswork.
  *
  * Usage: runMain graft.tools.RouteSweep [dir ...]
  *   SPARK_GRAFT_SWEEP_M=3,5 (default)
  */
object RouteSweep {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/tmp/graft_sf6s")
    val ms = sys.env.getOrElse("SPARK_GRAFT_SWEEP_M", "3,5").split(",").map(_.trim.toInt)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    for (dir <- dirs; m <- ms) {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val base = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), graft.functions.VectorOps.toDouble(col("embedding")).as("v"))
      val planted = base.filter(col("vec_id") % 100 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("v"), x => x * 0.9 + 0.02).as("v"))
      val reps = base.unionByName(planted).localCheckpoint()
      val n = reps.count()
      val (bands, bits) = graft.etl.VectorLsh.adaptiveBandParams(n, simThreshold = 0.9)
      val t0 = System.nanoTime()
      val cand = graft.etl.VectorLsh.cellBandCandidateIds(
        reps, n, bands, bits, dims = 64, probeCells = m)
      val verified = cand
        .join(reps.select(col("vec_id").as("vec_a"), col("v").as("va")), "vec_a")
        .join(reps.select(col("vec_id").as("vec_b"), col("v").as("vb")), "vec_b")
        .filter(round(call_function("cosine_fast", col("va"), col("vb")), 6) >= 0.9)
        .select("vec_a", "vec_b").localCheckpoint()
      val nVer = verified.count()
      val t = (System.nanoTime() - t0) / 1e9
      val expected = base.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("vec_a"), (col("vec_id") + 1000000L).as("vec_b"))
      val missing = expected.join(verified, Seq("vec_a", "vec_b"), "left_anti").count()
      val nPlanted = expected.count()
      println(f"SWEEP $dir%-18s m=$m n=$n time=${t}%7.2f s pairs=$nVer " +
        f"planted=$nPlanted missing=$missing")
      spark.sparkContext.getPersistentRDDs
        .filter { case (id, _) => !before.contains(id) }
        .values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
