package graft

import graft.etl.Salting
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted two-phase aggregation must equal the direct aggregation exactly
  * (long counts; decimal-captured sums are reassociation-safe). */
class SaltingSpec extends AnyFunSuite with SparkTestBase {

  test("salted sum/count over a skewed key == direct groupBy on events") {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    val salted = Salting.saltedSumCount(
        e, col("user_id"), col("event_id"), saltFactor = 8,
        Map("sum_value" -> col("value").cast(Det.Money)))
      .select(col("_key").as("user_id"), col("n"),
        col("sum_value").cast("double").as("sum_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = e.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == direct && direct.nonEmpty)
  }
}
