package graft.tools

import graft.{Det, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev-only scratch probe for stage-level timing experiments. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"SCRATCH $name%-30s min=${runs.min}%6.3f s")
    }
    val li = Tables.lineitem(spark, dir)
    time("floor_count_nation")(Tables.nation(spark, dir).count(): Unit)
    time("li_scan_count")(li.count(): Unit)
    time("li_filter_count")(li.filter(col("l_shipdate") <= lit("2000-09-02 00:00:00").cast(TimestampNTZType)).count(): Unit)
    def q1(sums: Boolean) = {
      val f = li.filter(col("l_shipdate") <= lit("2000-09-02 00:00:00").cast(TimestampNTZType))
      val g = f.groupBy(col("l_returnflag"), col("l_linestatus"))
      if (sums) g.agg(
        count(lit(1)).as("n"),
        Det.dsum(col("l_quantity")).as("s1"),
        Det.dsum(col("l_extendedprice")).as("s2"),
        Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("s3"),
        Det.davg(col("l_quantity")).as("a1"),
        Det.davg(col("l_extendedprice")).as("a2"),
        Det.davg(col("l_discount")).as("a3"),
        Det.dstd(col("l_quantity")).as("sd"))
      else g.agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity")).as("s1"),
        sum(col("l_extendedprice")).as("s2"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("s3"),
        avg(col("l_quantity")).as("a1"),
        avg(col("l_extendedprice")).as("a2"),
        avg(col("l_discount")).as("a3"),
        stddev_samp(col("l_quantity")).as("sd"))
    }
    time("q1_decimal_aggs")(q1(true).collect(): Unit)
    time("q1_double_aggs")(q1(false).collect(): Unit)
    time("q1_decimal_sorted")(q1(true).orderBy("l_returnflag", "l_linestatus").collect(): Unit)
    spark.stop()
  }
}
