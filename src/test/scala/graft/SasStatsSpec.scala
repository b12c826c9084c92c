package graft

import graft.functions.SasStatsAggregator
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The typed Aggregator follows SAS missing semantics: nmiss counted,
  * stats over non-missing only, all-missing group → missing stats. */
class SasStatsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("nulls5-style input: n/nmiss/min/max/range with all-missing group") {
    val df = Seq(
      ("a", Option(1.0)), ("a", Option(5.0)), ("a", None),
      ("b", None), ("b", None))
      .toDF("k", "x")
    val stats = udaf(SasStatsAggregator.agg)
    val r = df.groupBy("k").agg(stats(col("x")).as("s"))
      .select(col("k"), col("s.n"), col("s.nmiss"), col("s.min"), col("s.max"), col("s.range"))
      .orderBy("k").collect()
    val a = r(0); val b = r(1)
    assert((a.getLong(1), a.getLong(2), a.getDouble(3), a.getDouble(4), a.getDouble(5))
      == ((2L, 1L, 1.0, 5.0, 4.0)))
    assert(b.getLong(1) == 0L && b.getLong(2) == 2L && b.isNullAt(3) && b.isNullAt(4) && b.isNullAt(5))
  }
}
