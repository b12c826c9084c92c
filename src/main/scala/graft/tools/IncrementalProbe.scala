package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/* r9 consolidation: IncrementalProbe2 (scan-term decomposition) deleted —
 * its findings are recorded in CROSSOVER.md r8; this probe's std/tiny/prep
 * profiles are the surviving measurement surface. */
/** Dev-only: the incremental near-dup contract measured the way it is
  * used — a FIXED batch (replica-0 mutants + copies) probed against
  * corpora of increasing size, so the probe's corpus-linear term (the
  * band-table scan) is isolated from batch-side work.
  *
  * r9: runs the PRODUCTION MinHashIndex.probe (which now bucket-prunes
  * the band and rep scans from the batch's key set) instead of an inline
  * replica of its r8 internals, and measures TWO batch profiles per
  * corpus:
  *   - the standard fixed batch (~500 docs, ~8 k distinct band keys) —
  *     keys ≫ bucket files at local bucket counts, so pruning selects
  *     everything and the timing isolates the non-pruning path;
  *   - a TINY batch (4 docs, ≤ 64 keys) against a bucket count scaled
  *     with the corpus (buckets ≈ band rows / 64 k, keeping FILE SIZE
  *     constant) — the local miniature of the 100 TB regime (keys ≪
  *     files), where the touched-file count is bounded by the batch's
  *     keys and the probe's scan bytes go FLAT in corpus size.
  * Pass dirs as `path[:buckets]`; default buckets = MinHashIndex.Buckets
  * for the standard run and corpus-scaled for the tiny run. */
object IncrementalProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/tmp/graft_sf6t", "/tmp/graft_sf12t")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    for (spec <- dirs) {
      val (dir, explicitBuckets) = ProbeData.parseDirSpec(spec)
      // FIXED batch: replica 0 only — constant size at every corpus scale
      val (corpus, batch) = ProbeData.corpusAndBatch(spark, dir)
      val tiny = batch.orderBy(col("id").asc).limit(4)
      // corpus-scaled bucket count for the tiny-batch run
      // (ProbeData.scaledBuckets): file size stays constant as the
      // corpus grows and the tiny batch's keys touch a strict (and
      // shrinking) file subset at every scale — the 100 TB file-count
      // geometry in miniature (pruning is file-list based since r9
      // session 2: it applies whenever touched < total)
      val nReps = ProbeData.repCount(corpus)
      val scaled = explicitBuckets.getOrElse(ProbeData.scaledBuckets(nReps))
      for ((label, tag, buckets, b) <- Seq(
          ("std", "neardup_repbase", graft.layouts.MinHashIndex.Buckets, batch),
          ("tiny", s"neardup_scaled$scaled", scaled, tiny))) {
        val (bandsT, repsT) = graft.layouts.MinHashIndex.ensure(
          spark, dir, corpus, tag, 5, 64, 16, 4, Seq("documents"), buckets = buckets)
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          val (pairs, _) = graft.layouts.MinHashIndex.probe(
            spark, bandsT, repsT, b, 5, 64, 16, 4, threshold = 0.5)
          val n = pairs.count()
          val t = (System.nanoTime() - t0) / 1e9
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
          (t, n)
        }
        println(f"INCPROBE $dir%-18s $label%-4s buckets=$buckets%5d reps=$nReps%9d " +
          f"probe_min=${times.map(_._1).min}%6.2f s " +
          f"all=${times.map(t => f"${t._1}%.2f").mkString(",")} pairs=${times.head._2}")
      }
      // r9: the FULL incremental-prep composite (llm_corpus_prep_
      // incremental shape) against the same index — the nightly job's
      // batch-proportional contract. The batch fixture is replica-0-only
      // (fixed as the corpus scales); the eval set is derived OUTSIDE the
      // timing (a real run reads a fixed benchmark file).
      {
        import graft.functions.TextOps
        val (bandsT, repsT) = graft.layouts.MinHashIndex.ensure(
          spark, dir, corpus.select(col("id"), col("text")), "neardup_repbase",
          5, 64, 16, 4, Seq("documents"))
        val prepBatch = spark.read.parquet(graft.Fixtures.incPrepBatch(spark, dir))
        val words = split(TextOps.normalize(col("text")), " ")
        // FIXED eval set (replica 0 only), collected to a local relation:
        // a real nightly run reads a benchmark file, so neither the
        // derivation scan nor the broadcast may scale with the corpus
        import spark.implicits._
        val evalSh = corpus.filter(col("id") < 1000000000L &&
            col("id") % 1000000000L % 97 === 0)
          .select(explode(TextOps.wordShingles(
            concat_ws(" ", slice(words, 3, 12)), 5)).as("sh"))
          .distinct().as[String].collect().toSeq.toDF("sh")
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          val out = graft.examples.IncrementalPrep.run(
            spark, bandsT, repsT, prepBatch, evalNgrams = Some(evalSh))
          val nKept = out.kept.count()
          val t = (System.nanoTime() - t0) / 1e9
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          (t, nKept)
        }
        println(f"INCPROBE $dir%-18s prep buckets=${
          graft.layouts.MinHashIndex.bucketsOf(spark, bandsT)}%5d reps=$nReps%9d " +
          f"prep_min=${times.map(_._1).min}%6.2f s " +
          f"all=${times.map(t => f"${t._1}%.2f").mkString(",")} kept=${times.head._2}")
      }
    }
    spark.stop()
  }
}
