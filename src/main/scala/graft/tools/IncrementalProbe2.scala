package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: decompose the MinHashIndex probe's corpus-linear term.
  * Per dir: (a) raw band-table scan count, (b) scan + driver-collected
  * batch-key InSet filter, (c) the band join as the probe runs it,
  * (d) the full probe. Each min-of-2.
  *
  * Usage: runMain graft.tools.IncrementalProbe2 [dir ...]
  */
object IncrementalProbe2 {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/tmp/graft_sf6t", "/tmp/graft_sf12t")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    def min2(f: => Long): (Double, Long) = {
      val rs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      (rs.map(_._1).min, rs.head._2)
    }
    for (dir <- dirs) {
      val all = spark.read.parquet(graft.Fixtures.neardupCorpus(spark, dir))
      val repLocal = col("id") % 1000000000L
      val corpus = all.filter(repLocal < 1000000L)
      val batch = all.filter(col("id") < 1000000000L && repLocal >= 1000000L)
        .unionByName(corpus.filter(col("id") < 1000000000L && col("id") % 40 === 0)
          .select((col("id") + 2000000L).as("id"), col("text")))
      val (bandsT, repsT) = graft.layouts.MinHashIndex.ensure(
        spark, dir, corpus, "neardup_repbase", 5, 64, 16, 4, Seq("documents"))
      val (bBandsRaw, _) = graft.layouts.MinHashIndex.bandRows(batch, 5, 64, 16, 4)
      val bBands = bBandsRaw.localCheckpoint()
      val nKeys = bBands.select("bkey64").distinct().count()
      val (tScan, nScan) = min2(spark.table(bandsT).count())
      // the broadcast-probe candidate join alone (the corpus-linear term)
      val (tJoin, nJoin) = min2(
        spark.table(bandsT).withColumnRenamed("rep", "crep")
          .join(broadcast(bBands.select(col("bkey64"), col("rep").as("brep"))), "bkey64")
          .select(col("brep"), col("crep")).distinct().count())
      // the full probe (band join + Jaccard verification on touched reps)
      val (tProbe, nProbe) = min2 {
        val (ver, _) = graft.layouts.MinHashIndex.probe(
          spark, bandsT, repsT, batch, 5, 64, 16, 4, threshold = 0.5)
        val n = ver.count()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        n
      }
      println(f"INCPROBE2 $dir%-18s keys=$nKeys scan=${tScan}%5.2f s ($nScan) " +
        f"join=${tJoin}%5.2f s ($nJoin) probe=${tProbe}%5.2f s ($nProbe)")
    }
    spark.stop()
  }
}
