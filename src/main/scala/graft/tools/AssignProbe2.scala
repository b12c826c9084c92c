package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/* r9 consolidation: AssignProbe deleted — superseded by this variant;
 * recorded runs in CROSSOVER.md. */
/** Dev-only: forced-evaluation cost of the literal-argmax assignment at
  * varying k, with plan shape — sum(cent_id) forces the projection
  * (count() prunes it). */
object AssignProbe2 {
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
      println(f"AP2 $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    graft.functions.GraftFunctions.register(spark)
    val grouped = graft.operators.LlmOps.semdedupGrouped(spark, dir)
    val reps = grouped.select(col("rep_id").as("vec_id"), col("v")).persist()
    val n = reps.count()
    println(s"INFO n=$n")
    for (k <- Seq(8, 16, 50)) {
      val cents = reps.orderBy(col("vec_id").asc).limit(k)
        .select(col("vec_id").as("cent_id"), col("v").as("cv"))
      val a = graft.etl.Ivf.assign(reps, cents)
      if (k == 8) {
        val plan = a.queryExecution.executedPlan.toString
        println("INFO wscg=" + plan.contains("WholeStageCodegen") +
          " planHead=" + plan.linesIterator.take(2).mkString(" | ").take(150))
      }
      t(s"literal_k$k run1")(a.agg(sum("cent_id")).head())
      t(s"literal_k$k run2")(a.agg(sum("cent_id")).head())
      val j = graft.etl.Ivf.assignJoin(reps, cents)
      t(s"join_k$k run1")(j.agg(sum("cent_id")).head())
      t(s"join_k$k run2")(j.agg(sum("cent_id")).head())
    }
    spark.stop()
  }
}
