package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}
/** Dev-only: quantify the runtime bloom filter on the join_bloom_runtime
  * shape — same query, bloom on vs off, in the forced shuffle-join regime. */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf6")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def shape(s2: SparkSession): DataFrame = {
      val ord = Tables.orders(s2, dir)
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 150000.0)
        .select("o_orderkey")
      Tables.lineitem(s2, dir)
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_lines"), Det.dsum(col("l_extendedprice")).as("sum_price"))
    }
    def run(bloom: Boolean): Double = {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", bloom.toString)
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      shape(s2).count() // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); shape(s2).count(); (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }
    println(f"BLOOMPROBE shuffle-join: off=${run(false)}%.2f s  on=${run(true)}%.2f s")

    // Same shape over the BUCKETED layout (zero-exchange SMJ): does the
    // bloom filter still pay when there is no fact shuffle to shrink?
    def shapeBucketed(s2: SparkSession): DataFrame = {
      val Seq(ordersB, lineitemB) = graft.layouts.Bucketed.ensure(s2, dir, Seq(
        graft.layouts.Bucketed.Spec("orders_b", Tables.orders(s2, dir), "o_orderkey"),
        graft.layouts.Bucketed.Spec("lineitem_b", Tables.lineitem(s2, dir), "l_orderkey")))
      s2.table(lineitemB).hint("merge")
        .join(s2.table(ordersB)
          .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 150000.0),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_lines"), Det.dsum(col("l_extendedprice")).as("sum_price"))
    }
    def runBucketed(bloom: Boolean): Double = {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", bloom.toString)
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      shapeBucketed(s2).count()
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); shapeBucketed(s2).count(); (System.nanoTime() - t0) / 1e9
      }.min
    }
    println(f"BLOOMPROBE bucketed-join: off=${runBucketed(false)}%.2f s  on=${runBucketed(true)}%.2f s")
    spark.stop()
  }
}
