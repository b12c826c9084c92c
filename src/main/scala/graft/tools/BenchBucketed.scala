package graft.tools

import graft.Tables
import graft.layouts.Bucketed
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Crossover measurement for the bucketed co-located layout on the two
  * fact⋈fact headline shapes (q3/q5) — the round-2 verdict's top item:
  * "the engine's answer exists but isn't measured on this shape".
  *
  * Methodology matches graft.Bench/BASELINE.md exactly (2 warmups, min of
  * 3, per-query count(), same session conf); the one-time layout build is
  * timed and reported SEPARATELY, because at 100 TB it is paid once and
  * amortized over every subsequent join on that key. Also reports the
  * number of shuffle exchanges in each bucketed plan — the whole point is
  * that the fact⋈fact join runs with ZERO exchange on the join keys.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.BenchBucketed
  */
object BenchBucketed {

  private def rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf3")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (16 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one-time layout builds (timed separately — the amortized cost): the
    // fact layout, then the big-dim co-location (customer_b / orders_bc /
    // the orders⋈customer join index orders_cust_b — r4 verdict item 1)
    val t0 = System.nanoTime()
    val buckets = cpus.toInt
    val Seq(ordersB, lineitemB) = Bucketed.ensure(spark, sfDir, Seq(
      Bucketed.Spec("orders_b", Tables.orders(spark, sfDir), "o_orderkey"),
      Bucketed.Spec("lineitem_b", Tables.lineitem(spark, sfDir), "l_orderkey")),
      buckets = buckets)
    val layoutSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val Seq(customerB, ordersBc, ordersCustB) =
      graft.operators.Joins.bucketedDims(spark, sfDir, buckets = buckets)
    val dimLayoutSec = (System.nanoTime() - t1) / 1e9

    def q3b(s: SparkSession, dir: String): DataFrame = {
      val cust = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      s.table(lineitemB).select("l_orderkey", "l_extendedprice", "l_discount")
        .hint("merge")
        .join(s.table(ordersB).select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(sum(rev).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
    }

    def q5b(s: SparkSession, dir: String): DataFrame =
      s.table(lineitemB).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .hint("merge")
        .join(s.table(ordersB).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir).select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, dir).select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(rev).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)

    // variant for big-replica scales: the customer dim un-hinted, so the
    // session's size-driven strategy picks a shuffled hash join instead
    // of a forced broadcast — at sf12 the 1.8 M-row broadcast build
    // dominates q5, and this measures the alternative regime
    def q5bShufDim(s: SparkSession, dir: String): DataFrame =
      s.table(lineitemB).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .hint("merge")
        .join(s.table(ordersB).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir).select("c_custkey", "c_nationkey")
          .hint("shuffle_hash"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, dir).select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(rev).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)

    // q5 over the JOIN-INDEX layout: lineitem_b ⋈ orders_cust_b is a
    // zero-exchange SMJ and the customer attribute rides along — no
    // customer broadcast, no custkey exchange anywhere (the registry's
    // join_star_colocated shape with the headline's plain-double agg)
    def q5Enriched(s: SparkSession, dir: String): DataFrame =
      s.table(lineitemB).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .hint("merge")
        .join(s.table(ordersCustB), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, dir).select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(rev).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)

    // the GENERIC dim co-location (no denormalized index): flip the join
    // order — orders_bc ⋈ customer_b is a zero-exchange SMJ on custkey,
    // then ONE exchange re-keys the narrow enriched orders onto the
    // bucketed lineitem's orderkey partitioning. Measures what co-locating
    // the dim buys WITHOUT paying the join-index build.
    def q5DimBucketed(s: SparkSession, dir: String): DataFrame =
      s.table(lineitemB).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .hint("merge")
        .join(
          s.table(ordersBc).select("o_orderkey", "o_custkey").hint("merge")
            .join(s.table(customerB).select("c_custkey", "c_nationkey"),
              col("o_custkey") === col("c_custkey"))
            .select("o_orderkey", "c_nationkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, dir).select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(rev).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)

    val shapes: Seq[(String, (SparkSession, String) => DataFrame)] =
      Seq("q3_bucketed" -> (q3b _), "q5_bucketed" -> (q5b _),
        "q5_bucketed_shufdim" -> (q5bShufDim _),
        "q5_dim_bucketed" -> (q5DimBucketed _),
        "q5_enriched" -> (q5Enriched _))

    val timed = shapes.map { case (name, fn) =>
      val shuffles = fn(spark, sfDir).queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }.size
      fn(spark, sfDir).count(); fn(spark, sfDir).count() // warmups
      val runs = (1 to 3).map { _ =>
        val t = System.nanoTime(); fn(spark, sfDir).count()
        (System.nanoTime() - t) / 1e9
      }
      (name, runs.min, shuffles)
    }

    val qs = timed.map { case (k, v, sh) =>
      "\"" + k + "\":" + f"$v%.4f" + ",\"" + k + "_shuffles\":" + sh
    }.mkString("{", ",", "}")
    println(f"""{"metric":"bucketed_fact_join","layout_build_sec":$layoutSec%.2f,"dim_layout_build_sec":$dimLayoutSec%.2f,"buckets":$buckets,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
