package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** plans.MergeUnionScans: distinct-over-union of filtered scans of the
  * same table collapses to ONE scan with the OR'd filter; multiplicity-
  * sensitive or mismatched shapes are untouched. */
class MergeUnionScansSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Leaf-relation count in the OPTIMIZED logical plan — the rule is a
    * logical rewrite, and the physical plan hides scans inside AQE. */
  private def scanCount(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case l: LogicalRelation => l }.size

  private def orders = Tables.orders(spark, sf)

  test("fires: distinct over two filtered branches of one table -> one scan") {
    GraftFunctions.register(spark)
    val u = orders.filter(col("o_orderstatus") === "F").select("o_custkey")
      .union(orders.filter(col("o_orderstatus") === "P").select("o_custkey"))
    val merged = u.distinct()
    assert(scanCount(merged) == 1, "distinct-over-union must merge to one scan")
    // result identical to the unmerged evaluation (fresh session, no rule)
    val vanilla = spark.newSession()
    val o2 = Tables.orders(vanilla, sf)
    val expect = o2.filter(col("o_orderstatus") === "F").select("o_custkey")
      .union(o2.filter(col("o_orderstatus") === "P").select("o_custkey"))
      .distinct().collect().map(_.getLong(0)).sorted
    val got = merged.collect().map(_.getLong(0)).sorted
    assert(got.sameElements(expect))
  }

  test("does not fire on UNION ALL (multiplicity must be preserved)") {
    GraftFunctions.register(spark)
    val u = orders.filter(col("o_orderstatus") === "F").select("o_custkey")
      .union(orders.filter(col("o_orderstatus") === "O").select("o_custkey"))
    assert(scanCount(u) == 2, "bare union-all keeps both scans")
    // a row in both branches counts twice
    val nAll = u.count()
    val nF = orders.filter(col("o_orderstatus") === "F").count()
    val nO = orders.filter(col("o_orderstatus") === "O").count()
    assert(nAll == nF + nO)
  }

  test("does not fire under a counting aggregate (multiplicity-sensitive)") {
    GraftFunctions.register(spark)
    // same-status twice: every row matches BOTH branches, so count(*) over
    // the union is 2x the table count — a merged scan would halve it
    val u = orders.filter(col("o_orderstatus") === "F").select("o_custkey")
      .union(orders.filter(col("o_orderstatus") === "F").select("o_custkey"))
    val counted = u.groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    assert(scanCount(counted) == 2, "count() over union must keep both scans")
    val nF = orders.filter(col("o_orderstatus") === "F").count()
    assert(counted.agg(sum(col("n"))).collect().head.getLong(0) == 2 * nF)
  }

  test("does not fire across different tables or different projections") {
    GraftFunctions.register(spark)
    val crossTable = orders.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
      .union(Tables.customer(spark, sf).select(col("c_custkey").as("k")))
      .distinct()
    assert(scanCount(crossTable) == 2)
    val diffProj = orders.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .union(orders.filter(col("o_orderstatus") === "P").select(col("o_orderkey").as("o_custkey")))
      .distinct()
    assert(scanCount(diffProj) == 2)
  }
}
