package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: the incremental near-dup contract measured the way it is
  * used — a FIXED batch (replica-0 mutants + copies) probed against
  * corpora of increasing size, so the probe's corpus-linear term (the
  * band-table scan) is isolated from batch-side work. Contrast column:
  * the full llm_dedup_minhash recompute at the same dir. */
object IncrementalProbe {
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
    for (dir <- dirs) {
      val all = spark.read.parquet(graft.Fixtures.neardupCorpus(spark, dir))
      val repLocal = col("id") % 1000000000L
      val corpus = all.filter(repLocal < 1000000L)
      // FIXED batch: replica 0 only — constant size at every corpus scale
      val batch = all.filter(col("id") < 1000000000L && repLocal >= 1000000L)
        .unionByName(corpus.filter(col("id") < 1000000000L && col("id") % 40 === 0)
          .select((col("id") + 2000000L).as("id"), col("text")))
      val (bandsT, repsT) = graft.layouts.MinHashIndex.ensure(
        spark, dir, corpus, "neardup_repbase", 5, 64, 16, 4, Seq("documents"))
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val (bBandsRaw, bReps) = graft.layouts.MinHashIndex.bandRows(batch, 5, 64, 16, 4)
        val cand = spark.table(bandsT).withColumnRenamed("rep", "crep")
          .join(broadcast(bBandsRaw.select(col("bkey64"), col("rep").as("brep"))), "bkey64")
          .select(col("brep"), col("crep")).distinct().localCheckpoint()
        val cSh = cand.select(col("crep")).distinct()
          .join(spark.table(repsT), col("crep") === col("rep"))
          .select(col("crep"), expr("word_shingles(norm, 5)").as("csh"))
        val bSh = bReps.select(col("rep").as("brep"), expr("word_shingles(norm, 5)").as("bsh"))
        val n = cand.join(bSh, "brep").join(cSh, "crep")
          .withColumn("jaccard", expr("jaccard_sim(bsh, csh)"))
          .filter(col("jaccard") >= 0.5).count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        (t, n)
      }
      println(f"INCPROBE $dir%-18s probe_min=${times.map(_._1).min}%6.2f s " +
        f"all=${times.map(t => f"${t._1}%.2f").mkString(",")} pairs=${times.head._2}")
    }
    spark.stop()
  }
}
