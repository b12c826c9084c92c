package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only decomposition of the q5 headline at a scaled dir: times the
  * bucketed scan alone, the zero-exchange fact⋈index SMJ alone, the SMJ
  * with the small-dim broadcasts, and the full aggregation, each as
  * 1 warmup + min-of-2 — so a q5 regression localizes to scan, merge,
  * broadcast, or agg. */
object Q5Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf12"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (16 * 1024 * 1024).toString)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering",
        sys.env.getOrElse("SPARK_GRAFT_BUCKET_ORDER", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val Seq(_, lineitemB) = graft.operators.Joins.bucketedFacts(spark, dir)
    val Seq(_, _, ordersCustB) = graft.operators.Joins.bucketedDims(spark, dir)
    def t(name: String)(f: => DataFrame): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"Q5PROBE $name%-22s min=${times.drop(1).min}%7.2f warm=${times.head}%7.2f")
    }
    val li = spark.table(lineitemB)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    t("scan_lineitem_b")(li.groupBy().agg(sum(col("l_extendedprice"))))
    t("scan_orders_cust_b")(spark.table(ordersCustB).groupBy().agg(sum(col("o_orderkey"))))
    val smj = li.hint("merge")
      .join(spark.table(ordersCustB), col("l_orderkey") === col("o_orderkey"))
    t("smj_count")(smj.groupBy().agg(sum(col("o_custkey"))))
    t("smj_wide")(smj.groupBy().agg(sum(col("l_extendedprice")), sum(col("l_discount")),
      sum(col("l_suppkey")), sum(col("c_nationkey"))))
    val smjSuppComposite = smj
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
    t("smj_supp_composite")(smjSuppComposite.groupBy().agg(sum(col("l_extendedprice"))))
    val smjSupp = smj
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
    t("smj_supp_longkey")(smjSupp.groupBy().agg(sum(col("l_extendedprice"))))
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val withDims = smjSupp
      .join(broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
    t("smj_plus_broadcasts")(withDims.groupBy().agg(sum(rev)))
    t("full_q5")(withDims.groupBy(col("n_name")).agg(sum(rev).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc))
    if (sys.env.contains("SPARK_GRAFT_Q5_EXPLAIN"))
      withDims.groupBy().agg(sum(rev)).explain("formatted")
    spark.stop()
  }
}
