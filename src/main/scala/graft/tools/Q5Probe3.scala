package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: root-cause hunt for the SMJ→BHJ composition tax (NOTES_r7
  * §4). Prints the formatted plan (codegen stage ids) for the slow
  * composition and micro-times variants that isolate candidate
  * mechanisms: codegen-stage membership, join key width, row copy. */
object Q5Probe3 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (16 * 1024 * 1024).toString)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val Seq(_, lineitemB) = graft.operators.Joins.bucketedFacts(spark, dir)
    val Seq(_, _, ordersCustB) = graft.operators.Joins.bucketedDims(spark, dir)
    def t(name: String)(f: => DataFrame): Unit = {
      val times = (1 to 4).map { _ =>
        val t0 = System.nanoTime(); f.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"Q5P3 $name%-22s min=${times.drop(1).min}%7.2f all=${times.map(x => f"$x%.2f").mkString(",")}")
    }
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val li4 = spark.table(lineitemB)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val smj = li4.hint("merge")
      .join(spark.table(ordersCustB), col("l_orderkey") === col("o_orderkey"))
    val smjSupp = smj.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .groupBy().agg(sum(col("l_extendedprice")))
    println("=== PLAN smj_then_bhj ===")
    smjSupp.explain("formatted")
    t("smj_then_bhj")(smjSupp)
    // exchange-inserted variant: force the BHJ into a FRESH codegen stage
    // by repartitioning the SMJ output first — if the tax is the stage
    // composition (not the probe itself), paying a shuffle makes it FASTER
    val smjX = smj.repartition(32)
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .groupBy().agg(sum(col("l_extendedprice")))
    t("smj_xchg_bhj")(smjX)
    spark.stop()
  }
}
