package graft

import graft.examples.TypedPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TypedPipelineSpec extends AnyFunSuite with SparkTestBase {

  test("typed Dataset pipeline equals the untyped DataFrame formulation") {
    val dir = "/root/testdata/sf0.001"
    val typed = TypedPipeline.segmentRevenue(spark, dir)
      .collect().map(r => (r.segment, r.n_orders, r.revenue)).toSet
    val untyped = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("rev"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(typed == untyped && typed.size == 5)
  }
}
