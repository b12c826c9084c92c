package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev-only scratch probe for stage-level timing experiments. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "10")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (10 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeIt(name: String)(f: => Unit): Unit = {
      f; f
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"SCRATCH $name%-30s min=${runs.min}%6.3f s")
    }

    def rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

    // q5 with the orders side left to the optimizer (threshold 10MB: shuffle at sf1)
    def q5auto = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir).select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name")).agg(sum(rev).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
    timeIt("q5_auto_orders")(q5auto.count(): Unit)

    def q5shj = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .hint("shuffle_hash")
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir).select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name")).agg(sum(rev).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
    timeIt("q5_shufflehash_orders")(q5shj.count(): Unit)

    def q5bcast = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(Tables.orders(spark, dir).select("o_orderkey", "o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir).select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name")).agg(sum(rev).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
    timeIt("q5_bcast_orders")(q5bcast.count(): Unit)

    // q3: same question for the orders dim chain
    def q3auto = {
      val cust = Tables.customer(spark, dir)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_orderdate")
      Tables.lineitem(spark, dir).select("l_orderkey", "l_extendedprice", "l_discount")
        .join(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(sum(rev).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc).limit(10)
    }
    timeIt("q3_auto")(q3auto.count(): Unit)

    timeIt("dedup_exact")(graft.SparkEntry.queries("llm_dedup_exact")(spark, dir).count(): Unit)
    timeIt("theta")(graft.SparkEntry.queries("join_theta_range")(spark, dir).count(): Unit)
    spark.stop()
  }
}
