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

  test("runtime pruning measured: partitions read < total, in an isolated session") {
    // newSession() = same SparkContext, OWN SQLConf — the DPP threshold
    // overrides below cannot leak into the suite-shared session or the
    // driver's Verify session (round-2 verdict "Next round #4")
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    s.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "1000")
    // AQE wraps stages in leaf QueryStageExec nodes that plan.collect cannot
    // descend through; DPP itself is independent of AQE, so turn it off to
    // read the scan's runtime metrics directly
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val dir = "/root/testdata/sf0.001"
    val factPath = "/tmp/graft_dpp/orders_by_status_rt"
    val dimPath = "/tmp/graft_dpp/status_dim_rt"
    Tables.orders(s, dir)
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(factPath)
    import s.implicits._
    Seq(("F", "finished"), ("O", "open"), ("P", "pending"))
      .toDF("status", "label")
      .write.mode("overwrite").parquet(dimPath)
    val dim = s.read.parquet(dimPath).filter(col("label") === "finished")
    val fact = s.read.parquet(factPath)
    val j = fact.join(dim, fact("o_orderstatus") === dim("status"))
      .groupBy(col("label")).agg(count(lit(1)).as("n"))
    j.collect()

    val finalPlan = j.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = finalPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("orders_by_status_rt")) => f
    }
    assert(scan.nonEmpty, s"no fact scan found in:\n$finalPlan")
    val total = Tables.orders(s, dir).select("o_orderstatus").distinct().count()
    val read = scan.get.metrics("numPartitions").value
    assert(read >= 1 && read < total,
      s"DPP read $read of $total partitions — no runtime pruning happened")
  }
}
