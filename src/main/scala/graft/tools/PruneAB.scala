package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/* r9 consolidation: PruneProbe (parquet row-group pushdown sweep) and
 * BucketPruneProbe (SelectedBucketsCount plan check) deleted — the former's
 * negative result is recorded in CROSSOVER.md r8/r9, the latter is now a
 * PlanSpec test. */
/** A/B the probe's InSet prune at large key counts. */
object PruneAB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf24t"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val all = spark.read.parquet(graft.Fixtures.neardupCorpus(spark, dir))
    val repLocal = col("id") % 1000000000L
    val corpus = all.filter(repLocal < 1000000L)
    val batch = all.filter(col("id") < 1000000000L && repLocal >= 1000000L)
      .unionByName(corpus.filter(col("id") < 1000000000L && col("id") % 40 === 0)
        .select((col("id") + 2000000L).as("id"), col("text")))
    val (bandsT, repsT) = graft.layouts.MinHashIndex.ensure(
      spark, dir, corpus, "neardup_repbase", 5, 64, 16, 4, Seq("documents"))
    val (bBandsRaw, _) = graft.layouts.MinHashIndex.bandRows(batch, 5, 64, 16, 4)
    val bBands = bBandsRaw.select(col("bkey64"), col("rep").as("brep")).localCheckpoint()
    val keys = bBands.select(col("bkey64")).distinct().collect().map(_.getLong(0))
    println(s"batch keys: ${keys.length}")
    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"AB $label%-28s min=${ts.map(_._1).min}%6.2f s all=${ts.map(t => f"${t._1}%.2f").mkString(",")} n=${ts.head._2}")
    }
    time("scan_plain")(spark.table(bandsT).count())
    time("scan_inset")(spark.table(bandsT).filter(col("bkey64").isInCollection(keys)).count())
    time("join_plain")(spark.table(bandsT).withColumnRenamed("rep", "crep")
      .join(broadcast(bBands), "bkey64").select("brep", "crep").distinct().count())
    time("join_inset")(spark.table(bandsT).filter(col("bkey64").isInCollection(keys))
      .withColumnRenamed("rep", "crep")
      .join(broadcast(bBands), "bkey64").select("brep", "crep").distinct().count())
    spark.stop()
  }
}
