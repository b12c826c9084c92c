package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: what append fragmentation COSTS the MinHashIndex probe, and
  * what compaction buys back — the measured counterpart of the r9
  * compaction lifecycle (Bucketed.compact / MinHashIndex
  * .compactIfFragmented). Protocol per dir:
  *
  *   1. fresh index at the corpus-scaled bucket count (the
  *      IncrementalProbe tiny-profile geometry: keys ≪ files, the 100 TB
  *      regime in miniature), probe min-of-3 — the 1-file-per-bucket
  *      floor;
  *   2. N append rounds of small DISTINCT batches (each adds a file to
  *      every touched bucket), probe min-of-3 on the fragmented layout +
  *      the maxFilesPerBucket observable;
  *   3. compactIfFragmented, probe min-of-3 again — expected back at the
  *      floor, results invariant (pinned by count).
  *
  * Usage: runMain graft.tools.FragmentationProbe [dir[:buckets] ...]
  *   SPARK_GRAFT_FRAG_APPENDS (default 8)
  */
object FragmentationProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/tmp/graft_sf12t")
    val nAppends = sys.env.getOrElse("SPARK_GRAFT_FRAG_APPENDS", "8").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.layouts.MinHashIndex
    for (spec <- dirs) {
      val (dir, explicitBuckets) = ProbeData.parseDirSpec(spec)
      val (corpus, batch) = ProbeData.corpusAndBatch(spark, dir)
      val buckets = explicitBuckets.getOrElse(
        ProbeData.scaledBuckets(ProbeData.repCount(corpus)))
      // fresh layout every run: this probe MUTATES the index (appends),
      // so a stale cached layout would double-append across runs
      graft.layouts.Bucketed.invalidate(spark, "mhidx_fragprobe_")
      val (bandsT, repsT) = MinHashIndex.ensure(
        spark, dir, corpus, "fragprobe", 5, 64, 16, 4, Seq("documents"),
        buckets = buckets)

      def probeMin3(label: String): Long = {
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          val (pairs, _) = MinHashIndex.probe(
            spark, bandsT, repsT, batch, 5, 64, 16, 4, threshold = 0.5)
          val n = pairs.count()
          val t = (System.nanoTime() - t0) / 1e9
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          (t, n)
        }
        val stats = MinHashIndex.lastProbeStats.get
        println(f"FRAGPROBE $dir%-18s $label%-10s buckets=$buckets%5d " +
          f"fpb=${MinHashIndex.maxFilesPerBucket(spark, bandsT, repsT)}%3d " +
          f"probe_min=${times.map(_._1).min}%6.2f s " +
          f"all=${times.map(t => f"${t._1}%.2f").mkString(",")} " +
          f"pairs=${times.head._2} scans=$stats")
        times.head._2
      }

      val pairs0 = probeMin3("fresh")
      // append rounds: tiny DISTINCT batches (unique texts per round, so
      // every round adds real rows and its bands fragment their buckets)
      for (r <- 1 to nAppends) {
        val appendBatch = spark.range(60)
          .select((col("id") + 900000000L + r * 1000L).as("id"),
            concat_ws(" ", (1 to 40).map(i =>
              concat(lit(s"frag${r}w$i"), (col("id") % 7).cast("string"))): _*).as("text"))
        val (p, reps) = MinHashIndex.probe(
          spark, bandsT, repsT, appendBatch, 5, 64, 16, 4, threshold = 0.5)
        MinHashIndex.append(spark, bandsT, repsT, p, reps, 5, 64, 16, 4)
      }
      val pairs1 = probeMin3(s"frag+$nAppends")
      val t0 = System.nanoTime()
      val ran = MinHashIndex.compactIfFragmented(spark, bandsT, repsT, maxFiles = 2)
      println(f"FRAGPROBE $dir%-18s compact    ran=$ran " +
        f"t=${(System.nanoTime() - t0) / 1e9}%6.2f s")
      val pairs2 = probeMin3("compacted")
      assert(pairs1 == pairs2,
        s"compaction changed probe results: $pairs1 vs $pairs2")
      assert(pairs0 <= pairs1, s"appends cannot reduce pairs: $pairs0 vs $pairs1")
    }
    spark.stop()
  }
}
