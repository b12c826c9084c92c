package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev-only scratch probe for stage-level timing experiments. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf6")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dataBytes = Option(new java.io.File(dir).listFiles())
      .map(_.map(_.length).sum).getOrElse(0L)
    val shufflePartitions =
      math.max(4, math.min(cpus.toInt, (dataBytes / (32L << 20)).toInt))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (16 * 1024 * 1024).toString)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String)(f: => Long): Unit = {
      f // warmup
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"SCRATCH $name%-34s min=${runs.min}%6.3f s")
    }

    val o = Tables.orders(spark, dir)
    def current = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .union(o.filter(col("o_orderstatus") === "P").select(col("o_custkey")))
      .distinct()
      .orderBy(col("o_custkey").asc_nulls_first)
    def perSide = o.filter(col("o_orderstatus") === "F").select(col("o_custkey")).distinct()
      .union(o.filter(col("o_orderstatus") === "P").select(col("o_custkey")).distinct())
      .distinct()
      .orderBy(col("o_custkey").asc_nulls_first)
    def oneScan = o.filter(col("o_orderstatus").isin("F", "P")).select(col("o_custkey"))
      .distinct()
      .orderBy(col("o_custkey").asc_nulls_first)

    t("current union->distinct")(current.count())
    t("per-side distinct->union->distinct")(perSide.count())
    t("one-scan isin->distinct")(oneScan.count())
    graft.functions.GraftFunctions.register(spark)
    t("union->distinct w/ MergeUnionScans")(current.count())
    t("registry row w/ rule") {
      graft.SparkEntry.queries("set_union_distinct")(spark, dir).count()
    }
    println("==== merged plan ====")
    current.explain("formatted")
    spark.stop()
  }
}
