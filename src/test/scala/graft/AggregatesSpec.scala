package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy bounds for the sketch-based 100 TB twins (no SQL oracle —
  * sketches are engine-specific): approx distinct within the configured
  * rsd of the exact count; approx percentile within the neighborhood of
  * the exact one. */
class AggregatesSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct within rsd of exact per event_type") {
    val approx = SparkEntry.queries("agg_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(2.0, 5 * 0.02 * n),
        s"$k: approx=${approx(k)} exact=$n")
    }
  }

  test("approx_percentile lands within the exact percentile neighborhood") {
    val approx = SparkEntry.queries("agg_quantiles_approx")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"))
      .agg(expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (p50, p95)) =>
      assert(math.abs(approx(k)._1 - p50) / p50 < 0.02, s"$k p50")
      assert(math.abs(approx(k)._2 - p95) / p95 < 0.02, s"$k p95")
    }
  }
}
