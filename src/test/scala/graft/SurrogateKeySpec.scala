package graft

import graft.etl.SurrogateKey
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-safe surrogate key: same 1..N contiguous contract as the
  * unpartitioned-window formulation, but with no single-partition stage. */
class SurrogateKeySpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("contiguous 1..N in total-order position, no unpartitioned Window") {
    val base = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val out = SurrogateKey.assign(base, Seq(col("c_custkey").asc_nulls_first))
    // no WindowExec at all in the physical plan
    assert(!out.queryExecution.executedPlan.toString.contains("Window"))
    val rows = out.orderBy("sk").collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = rows.length
    assert(n == base.count())
    assert(rows.map(_._1).toSeq == (1L to n).toSeq)              // contiguous, 1-based
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq)  // sk follows key order
  }

  test("deterministic across independent runs and partition counts") {
    val base = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val a = SurrogateKey.assign(base, Seq(col("c_custkey").asc_nulls_first))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = SurrogateKey.assign(base.repartition(13), Seq(col("c_custkey").asc_nulls_first))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b)
  }
}
