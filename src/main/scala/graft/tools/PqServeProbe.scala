package graft.tools

import graft.etl.{Ivf, Pq}
import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The 768-dim design point through the PERSISTED index path (r14
  * verdict item 5): r14's recall/latency numbers came from
  * AnnScaleProbe's in-session encode; this drives the same 1 M ×
  * 768-dim corpus through `PqIndex.ensure` → `PqIndex.serve` — the
  * marker-validated cached listing, served relation, and cent_id
  * partition pruning that `llm_ann_ivfpq_persisted` actually serves
  * with — and records end-to-end probe latency, files read (for BOTH
  * tiers: codes for the ADC stage, the r16 cell-partitioned float tier
  * for the exact re-rank), and recall@k vs exact brute force. Training
  * uses the sample caps (the production shape — fitting is
  * sample-proportional); the full corpus pays one assignment and one
  * encode pass inside the build.
  *
  * Usage: runMain graft.tools.PqServeProbe [dirWithEmbeddingsParquet]
  *   SERVE_M (default 96), SERVE_K (256), SERVE_NLIST (1024),
  *   SERVE_NPROBE (4), SERVE_SHORTLIST (500), SERVE_TOPK (10),
  *   SPARK_GRAFT_CPUS (32). PROBE lines per the CROSSOVER.md protocol. */
object PqServeProbe {

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / math.sqrt(na * nb)
  }

  /** The executed scans' numFiles metric — the pruning observable both
    * stages report. SUMS over every FileSourceScanExec leaf and requires
    * at least one (r16 ADVICE: the collectFirst form silently reported
    * the wrong leaf's count — or 0 — if a probe shape ever gained a join
    * or an AQE wrapper; a shape change now fails the probe loudly). */
  private def scanNumFiles(df: org.apache.spark.sql.DataFrame): Long = {
    val scans = df.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }
    require(scans.nonEmpty,
      "scanNumFiles: no FileSourceScanExec leaf — probe plan shape changed")
    scans.sum
  }

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_emb_hd")
    val m = sys.env.getOrElse("SERVE_M", "96").toInt
    val kpq = sys.env.getOrElse("SERVE_K", "256").toInt
    val nlist = sys.env.getOrElse("SERVE_NLIST", "1024").toInt
    val np = sys.env.getOrElse("SERVE_NPROBE", "4").toInt
    val shortlist = sys.env.getOrElse("SERVE_SHORTLIST", "500").toInt
    val topK = sys.env.getOrElse("SERVE_TOPK", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)

    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val n = corpus.count()
    val dims = corpus.select(size(col("v"))).head.getInt(0)
    println(s"PROBE pq_serve corpus=$dir n=$n dims=$dims m=$m kpq=$kpq " +
      s"nlist=$nlist nprobe=$np shortlist=$shortlist")

    val (art, tBuild) = timed {
      graft.layouts.PqIndex.ensure(spark, s"hd_$dir", corpus, dims,
        k = nlist, iters = 2, m = m, kpq = kpq, pqIters = 2,
        ivfSampleCap = Ivf.trainSampleCap(nlist),
        pqSampleCap = Pq.trainSampleCap(kpq))
    }
    val codeFiles = graft.layouts.PqIndex.serve(spark, art.codes).inputFiles.length
    def du(path: String): Long = {
      def rec(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(rec).sum).getOrElse(0L)
        else f.length()
      rec(new java.io.File(path.stripPrefix("file:")))
    }
    val manifest = graft.layouts.PqIndex.serve(spark, art.manifest).head
    println(f"PROBE pq_serve build_s=$tBuild%.1f files=$codeFiles " +
      f"codes_mb=${du(art.codes) / 1e6}%.0f floats_mb=${du(art.floats) / 1e6}%.0f " +
      s"manifest=graded:${manifest.getLong(1)}/deg:${manifest.getLong(2)}" +
      s"/insuf:${manifest.getLong(3)}/min_ratio:${manifest.get(4)}")

    // ~64 deterministic queries (the AnnScaleProbe selection)
    val qmod = sys.env.getOrElse("ANN_QMOD", "32749").toLong
    val queries = corpus.filter(pmod(xxhash64(col("vec_id")), lit(qmod)) === 0)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).take(64)

    def cosExpr(qv: Array[Double]) =
      round(call_function("cosine_fast", col("v"), typedlit(qv.toSeq)), 6)

    // exact ground truth per query (scan + heap)
    val gt = queries.map { case (qid, qv) =>
      qid -> corpus.select(col("vec_id"), cosExpr(qv).as("c"))
        .orderBy(col("c").desc_nulls_last, col("vec_id").asc_nulls_first)
        .limit(topK).collect().map(_.getLong(0)).toSeq
    }.toMap

    // SERVE: model sidecars once (the serving-node startup), then per
    // query: driver-side probe choice, pruned ADC shortlist through the
    // served relation, exact re-rank point-fetched from the corpus
    val cents = graft.layouts.PqIndex.serve(spark, art.cents).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    val books = graft.layouts.PqIndex.loadBooks(spark, art.books)
    val served = graft.layouts.PqIndex.serve(spark, art.codes)
    val floats = graft.layouts.PqIndex.serve(spark, art.floats)
    val floatFiles = floats.inputFiles.length
    var filesRead = 0L
    var rrFilesRead = 0L
    val perQ = queries.map { case (qid, qv) =>
      val probeIds = cents.map { case (cid, cv) => (cosine(qv, cv), cid) }
        .sortBy { case (c, cid) => (-c, cid) }.take(np).map(_._2).toSeq
      val (ids, tAdc) = timed {
        val df = served.filter(col("cent_id").isin(probeIds: _*))
          .withColumn("adc", graft.operators.LlmOps.adcCosCol(books, qv.toSeq))
          .orderBy(col("adc").desc_nulls_last, col("vec_id").asc_nulls_first)
          .limit(shortlist)
          .select(col("vec_id"))
        val r = df.collect().map(_.getLong(0)).toSeq
        val nf = scanNumFiles(df)
        (r, nf)
      }
      filesRead += ids._2
      val adcRecall =
        ids._1.take(topK).toSet.intersect(gt(qid).toSet).size.toDouble / topK
      // re-rank from the CELL-PARTITIONED float sidecar (r15 verdict
      // item 1): cent_id pruning first, id predicate inside the probed
      // cells only — the r15 form point-fetched from the raw single-file
      // corpus and paid a full id-predicate scan (~1.0 s/query vs ~0.1)
      val (rr, tRr) = timed {
        val df = floats.filter(col("cent_id").isin(probeIds: _*))
          .filter(col("vec_id").isin(ids._1: _*))
          .select(col("vec_id"), cosExpr(qv).as("c"))
          .orderBy(col("c").desc_nulls_last, col("vec_id").asc_nulls_first)
          .limit(topK)
        val r = df.collect().map(_.getLong(0)).toSeq
        val nf = scanNumFiles(df)
        (r, nf)
      }
      rrFilesRead += rr._2
      val reranked = rr._1
      val recall = reranked.toSet.intersect(gt(qid).toSet).size.toDouble / topK
      (adcRecall, recall, tAdc, tRr)
    }
    println(f"PROBE pq_serve m=$m nprobe=$np shortlist=$shortlist " +
      f"adc_recall@$topK=${perQ.map(_._1).sum / perQ.length}%.3f " +
      f"recall@$topK=${perQ.map(_._2).sum / perQ.length}%.3f " +
      f"adc_lat_avg_s=${perQ.map(_._3).sum / perQ.length}%.3f " +
      f"rerank_lat_avg_s=${perQ.map(_._4).sum / perQ.length}%.3f " +
      f"files_read_frac=${filesRead.toDouble / (perQ.length.toLong * codeFiles)}%.4f " +
      f"rr_files_frac=${rrFilesRead.toDouble / (perQ.length.toLong * floatFiles)}%.4f")
    spark.stop()
  }
}
