package graft

import graft.examples.EtlJob
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed nightly-load job: split arithmetic, dimension invariants,
  * dedup cardinality, and a consistent final report. */
class EtlJobSpec extends AnyFunSuite with SparkTestBase {

  test("nightly load composes: split + SCD2 + dedup + report stay consistent") {
    val dir = "/root/testdata/sf0.001"
    val out = EtlJob.nightlyLoad(spark, dir)
    val total = Tables.lineitem(spark, dir).count()
    assert(out.clean.count() + out.rejects.count() == total)
    assert(out.rejects.filter(col("err_tags") === "").count() == 0)

    // dimension: exactly one current row per business key; changed keys doubled
    val perKey = out.customerDim.filter(col("is_current") === 1)
      .groupBy("bk").count().filter(col("count") =!= 1).count()
    assert(perKey == 0)
    val changed = Tables.customer(spark, dir).filter(col("c_custkey") % 10 === 0).count()
    assert(out.customerDim.count() == Tables.customer(spark, dir).count() + changed)
    // surrogate keys: contiguous 1..N over the whole dimension
    val sks = out.customerDim.select("sk").collect().map(_.getLong(0)).sorted
    assert(sks.toSeq == (1L to sks.length).toSeq)

    // dedup keeps exactly one row per order key, delta version where present
    assert(out.dedupedOrders.count() == Tables.orders(spark, dir).count())
    val deltaKeys = out.dedupedOrders.filter(col("src") === "delta").count()
    assert(deltaKeys == Tables.orders(spark, dir).filter(col("o_orderkey") % 9 === 0).count())

    // report covers every segment and only clean revenue
    val segs = out.report.collect().map(_.getString(0)).toSet
    assert(segs == Set("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))
    assert(out.report.agg(sum("n_lines")).head().getLong(0) <= total)
    out.clean.unpersist()
  }
}
