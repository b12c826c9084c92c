package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/* r9 consolidation: SemdedupStages deleted — superseded by this variant;
 * recorded runs in CROSSOVER.md. */
/** Dev-only: finer-grained semdedup stage attribution — per-Lloyd-
  * iteration split (assign-scan vs mean-aggregation vs collect), double
  * runs of each stage to separate recompute effects from kernel cost. */
object SemdedupStages2 {
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
      println(f"STAGE2 $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    graft.functions.GraftFunctions.register(spark)
    val grouped = graft.operators.LlmOps.semdedupGrouped(spark, dir)
    val reps = grouped.select(col("rep_id").as("vec_id"), col("v")).persist()
    val n = t("group+count")(reps.count())
    t("reps_recount_warm")(reps.count())
    val k = graft.etl.Ivf.adaptiveK(n)
    println(s"INFO n=$n k=$k")
    // inline Ivf.train with per-phase timing (no input unpersist)
    import spark.implicits._
    var cents = reps.orderBy(col("vec_id").asc).limit(k)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))
    for (it <- 1 to 3) {
      val assigned = graft.etl.Ivf.assign(reps, cents)
      val agg = assigned
        .select(col("cent_id"), posexplode(col("v")))
        .groupBy(col("cent_id"), col("pos"))
        .agg((sum(col("col").cast(DecimalType(28, 14))).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("m"))
        .groupBy(col("cent_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("cv"))
      val rows = t(s"iter$it collect")(agg.collect())
      cents = rows.map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq.toDF("cent_id", "cv")
    }
    val assigned = graft.etl.Ivf.assign(reps, cents)
    t("assign_count_1")(assigned.count())
    t("assign_count_2")(assigned.count())
    val ac = assigned.persist()
    t("assign_cache")(ac.count())
    spark.stop()
  }
}
