package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage attribution for llm_semdedup at a scaled dir: times
  * each pipeline stage separately so a regression localizes to grouping,
  * training, assignment, banding, the candidate join, or verification. */
object SemdedupStages {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf6d"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    graft.functions.GraftFunctions.register(spark)
    val grouped = graft.operators.LlmOps.semdedupGrouped(spark, dir)
    val reps = grouped.select(col("rep_id").as("vec_id"), col("v")).cache()
    val n = t("group+count")(reps.count())
    val k = graft.etl.Ivf.adaptiveK(n)
    println(s"INFO n=$n k=$k")
    val cents = t("train")(graft.etl.Ivf.train(reps, k = k, iters = 3))
    val assigned = graft.etl.Ivf.assign(reps, cents).cache()
    t("assign")(assigned.count())
    val (nBands, nBits) = graft.etl.VectorLsh.adaptiveBandParams(n, simThreshold = 0.9)
    println(s"INFO bands=$nBands bits=$nBits projections=${nBands * nBits}")
    val bucketed = graft.etl.VectorLsh.withBandBuckets(
        assigned, nBands = nBands, bitsPerBand = nBits, dims = 64)
      .select(col("vec_id"), col("cent_id"), col("band"), col("bucket")).cache()
    t("banding")(bucketed.count())
    val candIds = bucketed.as("a").join(bucketed.as("b"),
        col("a.cent_id") === col("b.cent_id") && col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .dropDuplicates(Seq("vec_a", "vec_b")).cache()
    val nCand = t("cand_join")(candIds.count())
    println(s"INFO candidates=$nCand")
    val dropped = candIds
      .join(reps.select(col("vec_id").as("vec_a"), col("v").as("va")), "vec_a")
      .join(reps.select(col("vec_id").as("vec_b"), col("v").as("vb")), "vec_b")
      .filter(round(expr("cosine_fast(va, vb)"), 6) >= 0.9)
      .select(col("vec_b").as("vec_id")).distinct()
    t("verify")(dropped.count())
    spark.stop()
  }
}
