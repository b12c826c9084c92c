package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: does an InSet on the bucket column produce SelectedBucketsCount
  * (a) by default, (b) with autoBucketedScan disabled? */
object BucketPruneProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val all = spark.read.parquet(graft.Fixtures.neardupCorpus(spark, sf))
    val corpus = all.filter(col("id") % 1000000000L < 1000000L)
    val (bandsT, _) = graft.layouts.MinHashIndex.ensure(
      spark, sf, corpus, "neardup_repbase", 5, 64, 16, 4, Seq("documents"))
    val keys = Seq(-7878073526559794484L, -5867427125961851575L, 826321196691461693L)
    def planOf(conf: String): String = {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", conf)
      spark.table(bandsT).filter(col("bkey64").isInCollection(keys))
        .queryExecution.executedPlan.toString
    }
    for (c <- Seq("true", "false")) {
      val p = planOf(c)
      println(s"=== autoBucketedScan=$c ===")
      println(p.linesIterator.filter(l => l.contains("Bucketed") || l.contains("SelectedBuckets")).mkString("\n"))
    }
    // and inside a broadcast join (the probe shape)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    val probeDf = keys.map(k => (k, 1L)).toDF("bkey64", "brep")
    val j = spark.table(bandsT).filter(col("bkey64").isInCollection(keys))
      .join(broadcast(probeDf), "bkey64")
    println("=== join, autoBucketedScan=false ===")
    println(j.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Bucketed") || l.contains("SelectedBuckets")).mkString("\n"))
    spark.stop()
  }
}
