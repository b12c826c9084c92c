package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query runs end-to-end on sf0.001 (t1-style smoke);
  * queries that must produce rows do. */
class QueriesSmokeSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  // join_interval / llm near-dup outputs can legitimately be small but not
  // empty; nothing in the registry should be empty at sf0.001 except none.
  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.all.foreach { q =>
    test(s"query ${q.name} executes and returns rows on sf0.001") {
      val n = q.build(spark, sf).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("oracle keys are a subset of query keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
