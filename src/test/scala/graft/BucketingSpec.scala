package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the co-located-join layout for repeated fact⋈fact joins at
  * scale (SCALE.md §C): both tables bucketed on the join key with the same
  * bucket count join WITHOUT a shuffle exchange. Pinned here because it is
  * a storage-layout decision the engine's operators rely on, not an
  * optimizer accident. */
class BucketingSpec extends AnyFunSuite with SparkTestBase {

  test("same-key bucketed tables sort-merge join with no hash exchange") {
    val dir = "/root/testdata/sf0.001"
    // the in-memory catalog forgets tables across JVMs but their managed
    // locations persist — wipe them for an idempotent re-run
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("/tmp/graft_bucket_wh"))
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '/tmp/graft_bucket_wh'")
    spark.sql("DROP TABLE IF EXISTS bucketdb.orders_b")
    spark.sql("DROP TABLE IF EXISTS bucketdb.lineitem_b")
    Tables.orders(spark, dir)
      .write.mode("overwrite")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("bucketdb.orders_b")
    Tables.lineitem(spark, dir)
      .write.mode("overwrite")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("bucketdb.lineitem_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  // force the SMJ path
    try {
      val j = spark.table("bucketdb.lineitem_b")
        .join(spark.table("bucketdb.orders_b"), col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "o_totalprice")
      assert(j.count() == 6000)  // every lineitem has its order (FIXTURES RI)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join still shuffles:\n" + plan)
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
