package graft.examples

import graft.Tables
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed Dataset[T] pipeline (the "case-class Encoders where type safety
  * helps" surface): the same revenue-per-customer-segment job as the
  * DataFrame operators, but with compile-time field checking through
  * `as[T]`, `joinWith`, and `groupByKey` — the style for long-lived
  * pipeline code where schema drift should fail the BUILD, not the 3 a.m.
  * run. TypedPipelineSpec proves it equals the untyped formulation.
  *
  * 100 TB note: typed operators plan to the same physical operators as the
  * untyped API (joinWith = SortMergeJoin/BHJ on the same keys; groupByKey +
  * mapValues/reduceGroups can fall out of whole-stage codegen, so the
  * aggregation here still uses untyped aggs over the typed join — the
  * pragmatic mix).
  */
object TypedPipeline {

  final case class Order(o_orderkey: Long, o_custkey: Long, o_totalprice: Double)
  final case class Customer(c_custkey: Long, c_mktsegment: String)
  final case class SegmentRevenue(segment: String, n_orders: Long, revenue: Double)

  def segmentRevenue(spark: SparkSession, dir: String): Dataset[SegmentRevenue] = {
    import spark.implicits._
    val orders: Dataset[Order] = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice").as[Order]
    val customers: Dataset[Customer] = Tables.customer(spark, dir)
      .select("c_custkey", "c_mktsegment").as[Customer]
    orders
      .joinWith(customers, orders("o_custkey") === customers("c_custkey"))
      .groupByKey(_._2.c_mktsegment)
      .agg(
        count(lit(1)).as("n").as[Long],
        graft.Det.dsum(col("_1.o_totalprice")).as("rev").as[Double])
      .map { case (seg, n, rev) => SegmentRevenue(seg, n, rev) }
  }
}
