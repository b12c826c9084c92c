package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only utility: print a registry row's executed plan at a given
  * sf dir (was Scratch2; renamed in the r9 probe consolidation). */
object ShowPlan {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val name = if (args.length > 1) args(1) else "llm_dedup_minhash_incremental"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(graft.SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString)
    spark.stop()
  }
}
