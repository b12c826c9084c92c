package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition pruning: a partitioned fact joined to a filtered dim
  * must prune fact partitions at RUNTIME from the dim-side values — the
  * mechanism that replaces SAS's macro-loop-over-partitioned-libraries
  * pattern at scale (SURVEY §4.1). */
class DppSpec extends AnyFunSuite with SparkTestBase {

  test("fact partitions pruned by the dim side's filter at runtime") {
    val dir = "/root/testdata/sf0.001"
    val factPath = "/tmp/graft_dpp/orders_by_status"
    Tables.orders(spark, dir)
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(factPath)
    import spark.implicits._
    // the benefit heuristic compares estimated pruned bytes against the
    // subquery's broadcast cost — on KB-sized local files it always says
    // no; raise the assumed filter ratio so the mechanism itself is
    // exercised (at real scale the stats make this call correctly)
    val prevStats = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    val prevRatio = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "1000")
    try {
    // dim restricts to one status via a FILTER over a file source (the DPP
    // rule requires a selective predicate on the build side; a literal
    // local relation would be constant-folded away); which partitions
    // survive is only knowable at runtime
    val dimPath = "/tmp/graft_dpp/status_dim"
    Seq(("F", "finished"), ("O", "open"), ("P", "pending"))
      .toDF("status", "label")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("label") === "finished")
    val fact = spark.read.parquet(factPath)
    val j = fact.join(dim, fact("o_orderstatus") === dim("status"))
      .groupBy(col("label")).agg(count(lit(1)).as("n"))
    val rows = j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan)
    // and the pruned result equals the direct filtered count
    val expected = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F").count()
    assert(rows.head.getLong(1) == expected)
    } finally {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", prevStats)
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", prevRatio)
    }
  }
}
