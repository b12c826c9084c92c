package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: per-form cost of nearest-centroid assignment at a scaled
  * dir — literal argmax vs broadcast join, warm (second run) numbers. */
object AssignProbe {
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
      println(f"ASSIGN $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    graft.functions.GraftFunctions.register(spark)
    val grouped = graft.operators.LlmOps.semdedupGrouped(spark, dir)
    val reps = grouped.select(col("rep_id").as("vec_id"), col("v")).cache()
    val n = reps.count()
    val k = graft.etl.Ivf.adaptiveK(n)
    println(s"INFO n=$n k=$k")
    // one scan, one cosine per row: the irreducible per-row floor
    val c0 = graft.etl.VectorLsh.hyperplanes(1, 64).head
    t("one_cosine_scan")(reps.select(
      sum(round(expr(s"cosine_fast(v, array(${c0.mkString("D,")}D))"), 6))).head())
    val cents = graft.etl.Ivf.train(reps, k = k, iters = 1)
    t("literal_cold")(graft.etl.Ivf.assign(reps, cents).count())
    t("literal_warm")(graft.etl.Ivf.assign(reps, cents).count())
    t("join_cold")(graft.etl.Ivf.assignJoin(reps, cents).count())
    t("join_warm")(graft.etl.Ivf.assignJoin(reps, cents).count())
    spark.stop()
  }
}
