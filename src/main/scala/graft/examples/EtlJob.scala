package graft.examples

import graft.{Det, Tables}
import graft.etl.Scd
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DateType

/** Macro-driven job flow (SURVEY §3.1.3): in SAS the top-level artifact is
  * a %macro driver chaining DATA/PROC steps over control tables; here the
  * HOST LANGUAGE is the macro system — an ordinary Scala function composes
  * the engine's operators into one nightly-load-shaped job:
  *
  *   1. validate/split the incoming fact rows (single pass, rule tags)
  *   2. SCD2-load the customer dimension from a derived delta and assign
  *      contiguous surrogate keys (scale-safe prefix-sum numbering)
  *   3. incremental-dedup the orders feed (latest version per key)
  *   4. produce the reporting aggregate off the clean slice
  *
  * Unlike a SAS driver, nothing materializes between steps: the whole job
  * is one lazy plan per output, fused by Catalyst. The clean/reject split
  * is the one deliberate materialization point (`cache`) because TWO
  * outputs branch from the same validated scan — the op-60 pattern.
  */
object EtlJob {

  final case class Outputs(
      clean: DataFrame, rejects: DataFrame,
      customerDim: DataFrame, dedupedOrders: DataFrame, report: DataFrame)

  def nightlyLoad(spark: SparkSession, dir: String): Outputs = {
    // 1. validate/split
    val rules = array(
      when(col("l_discount") > 0.08, lit("disc_high")),
      when(col("l_quantity") > 45.0, lit("qty_high")))
    val validated = Tables.lineitem(spark, dir)
      .withColumn("errs", filter(rules, e => e.isNotNull))
      .cache() // two sinks branch here (op 60): pay the scan once
    val clean = validated.filter(size(col("errs")) === 0).drop("errs")
    val rejects = validated.filter(size(col("errs")) > 0)
      .withColumn("err_tags", concat_ws(",", col("errs"))).drop("errs")

    // 2. SCD2 customer dimension load
    val master = Tables.customer(spark, dir)
      .select(col("c_custkey").as("bk"), col("c_acctbal").as("acctbal"),
        col("c_mktsegment").as("segment"),
        lit("2020-01-01").cast(DateType).as("valid_from"),
        lit(null).cast(DateType).as("valid_to"), lit(1).as("is_current"))
    val delta = Tables.customer(spark, dir).filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey").as("bk"), (col("c_acctbal") + 50.0).as("acctbal"),
        col("c_mktsegment").as("segment"))
    val customerDim = graft.etl.SurrogateKey.assign(
      Scd.scd2Load(master, delta, Seq("acctbal", "segment"), "2024-07-01"),
      Seq(col("bk").asc_nulls_first, col("valid_from").asc_nulls_first))

    // 3. incremental orders dedup (latest per key; delta wins ties)
    val ordersAll = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate"), lit("master").as("src"))
      .unionByName(Tables.orders(spark, dir).filter(col("o_orderkey") % 9 === 0)
        .select(col("o_orderkey"), col("o_custkey"), (col("o_totalprice") * 1.05).as("o_totalprice"),
          (col("o_orderdate") + expr("INTERVAL 1 DAY")).as("o_orderdate"), lit("delta").as("src")))
    val w = Window.partitionBy(col("o_orderkey"))
      .orderBy(col("o_orderdate").desc_nulls_last, col("src").asc_nulls_first)
    val dedupedOrders = ordersAll
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")

    // 4. reporting aggregate: clean-revenue per current customer segment
    val report = clean
      .join(dedupedOrders, col("l_orderkey") === col("o_orderkey"))
      .join(customerDim.filter(col("is_current") === 1),
        col("o_custkey") === col("bk"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_lines"),
        Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("segment").asc_nulls_first)

    Outputs(clean, rejects, customerDim, dedupedOrders, report)
  }
}
