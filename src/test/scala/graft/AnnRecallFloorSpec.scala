package graft

import graft.etl.{Ivf, Pq}
import graft.operators.LlmOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Evidence for `llm_ann_recall_floor` (oracle-none by the ANN-family
  * k-means sanction): the preflight must DISCRIMINATE the two corpus
  * shapes the r14 design-point probe measured — the hierarchical corpus
  * (graded near tier, PQ recall 1.000) passes, the flat-cluster
  * white-noise corpus (every in-cell candidate at the same cosine, ADC
  * recall 0.02–0.08) flags. Both corpora reproduce
  * tools/make_embeddings_hd.py's sin-synthesis in-JVM, at spec scale. */
class AnnRecallFloorSpec extends AnyFunSuite with SparkTestBase {

  private val (n, dims, nclust, nsub) = (2000, 64, 16, 8)
  private val (m, k) = (8, 16)

  /** tools/make_embeddings_hd.py's hierarchical synthesis:
    * v = center(c1) + 0.35·subcenter(c1,c2) + 0.08·noise(i) — a graded
    * near tier (sub-cluster mates ≫ cell bulk ≫ cross-cell). */
  private def hier(i: Long, j: Int): Double =
    math.sin(((i % nclust) * 1009 + j) * 0.37) +
      0.35 * math.sin((((i % nclust) * 131 + (i / nclust) % nsub) * 7561 + j) * 0.53) +
      0.08 * math.sin((i * 7919 + j * 104729) * 0.61)

  /** The r14 probe's FIRST-ATTEMPT shape: flat clusters + i.i.d.
    * per-dimension noise — every in-cluster candidate at the same cosine
    * ± noise smaller than any quantizer's reconstruction error. */
  private def flat(i: Long, j: Int): Double =
    math.sin(((i % nclust) * 1009 + j) * 0.37) +
      0.40 * math.sin((i * 7919 + j * 104729) * 0.61)

  private def corpus(f: (Long, Int) => Double): DataFrame = {
    val session = spark
    import session.implicits._
    (0L until n.toLong).map(i =>
      (i, (0 until dims).map(j => f(i, j)))).toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
  }

  private def preflight(vecs: DataFrame): Seq[(Long, Long, Double, Double, String)] = {
    val books = Pq.train(vecs, dims, m, k, iters = 4)
    val cents = Ivf.train(vecs, k = nclust, iters = 2)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val out = LlmOps.annRecallFloor(vecs, books, cents, dims)
    assert(out.columns.toSeq == Seq("cent_id", "members", "top_tier_cos",
      "bulk_cos", "margin", "quant_err", "recon_cos_p50", "ratio", "verdict"))
    out.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4),
      r.getDouble(5), r.getString(8))).toSeq
  }

  test("hierarchical corpus (the PQ-design regime): every sampled cell " +
      "verdicts graded — margin clears 2x the quantization noise") {
    val out = preflight(corpus(hier))
    assert(out.size == 4)
    assert(out.forall(_._2 > 10), s"cells too small to grade: $out")
    assert(out.forall(_._5 == "graded"),
      s"expected all graded, got: ${out.map(c => (c._1, c._3, c._4, c._5))}")
  }

  test("flat-noise corpus (the r14 recall-collapse shape): every sampled " +
      "cell verdicts degenerate — the margin drowns in quantization noise") {
    val out = preflight(corpus(flat))
    assert(out.size == 4)
    assert(out.forall(_._5 == "degenerate"),
      s"expected all degenerate, got: ${out.map(c => (c._1, c._3, c._4, c._5))}")
  }

  test("singleton sampled cell: an explicit insufficient_members row, " +
      "never a silently missing one (r15 ADVICE)") {
    val session = spark
    import session.implicits._
    // three handcrafted cells — sizes 10 / 8 / 1 — with the centroids
    // passed EXPLICITLY so the assignment is forced: the size-1 cell's
    // only member is its own probe, so it has nothing to score
    val d = 8
    def jig(i: Long, j: Int) = 0.01 * math.sin((i * 31 + j) * 0.7)
    val rows =
      (0L until 10L).map(i => (i, (0 until d).map(j =>
        (if (j < 2) 1.0 else 0.0) + jig(i, j)))) ++
      (10L until 18L).map(i => (i, (0 until d).map(j =>
        (if (j == 2 || j == 3) 1.0 else 0.0) + jig(i, j)))) ++
      Seq((18L, (0 until d).map(j => if (j == 4 || j == 5) 1.0 else 0.0)))
    val vecsDf = rows.toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    val cents = Seq(
      (0L, Seq(1.0, 1, 0, 0, 0, 0, 0, 0)),
      (1L, Seq(0.0, 0, 1, 1, 0, 0, 0, 0)),
      (2L, Seq(0.0, 0, 0, 0, 1, 1, 0, 0)))
    val books = Pq.train(vecsDf, d, 2, 4, iters = 2)
    val out = LlmOps.annRecallFloor(vecsDf, books, cents, d, sampleCells = 3)
      .collect()
    assert(out.length == 3, s"every sampled cell must emit a row: ${out.toSeq}")
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    val single = out.find(_.getLong(0) == 2L).get
    assert(single.getString(8) == "insufficient_members")
    assert(single.getLong(1) == 0L)
    assert((2 to 7).forall(single.isNullAt), s"metrics must be null: $single")
    out.filter(_.getLong(0) != 2L).foreach { r =>
      assert(Set("graded", "degenerate")(r.getString(8)))
      assert(r.getLong(1) > 0)
    }
  }

  test("scale hygiene: the preflight leaves NO persisted storage behind " +
      "and its census scan prunes to the one column assignment needs " +
      "(r15 verdict item 2 — the r16 fix of the full-corpus checkpoint)") {
    val vecsDf = corpus(hier)
    val books = Pq.train(vecsDf, dims, m, k, iters = 4)
    val centsSeq = Ivf.train(vecsDf, k = nclust, iters = 2)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    // (a) storage: the sample-bounded members persist must release
    // before the call returns — nothing corpus-proportional (or at all)
    // may outlive the preflight
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = LlmOps.annRecallFloor(vecsDf, books, centsSeq, dims)
    assert(out.collect().length == 4)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"preflight leaked persisted RDDs: $leaked")
    // (b) census pruning: over a parquet-backed corpus with extra
    // columns, the census plan's scan must read ONLY v (assignment's
    // input) — vec_id and payload columns prune away, and the plan
    // carries no materialization barrier that would block the pruning
    val dirPath = java.nio.file.Files.createTempDirectory("graft_census")
    val dir = dirPath.toString
    try {
    vecsDf.withColumn("payload", lit("x")).write.mode("overwrite").parquet(dir)
    val session = spark
    import session.implicits._
    val centsRel = centsSeq.toDF("cent_id", "cv")
    val census = graft.etl.AnnPreflight.cellCensus(
      spark.read.parquet(dir), centsRel, 4)
    // sparkPlan, not executedPlan: AQE wraps the latter in an
    // AdaptiveSparkPlanExec whose leaves hide the scan until execution
    val plan = census.queryExecution.sparkPlan
    val scan = plan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.nonEmpty, s"no file scan in census plan:\n$plan")
    assert(scan.get.requiredSchema.fieldNames.toSeq == Seq("v"),
      s"census scan must read only v, got ${scan.get.requiredSchema.fieldNames.toSeq}")
    val cached = plan.collect {
      case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => i
    }
    assert(cached.isEmpty, s"census plan must not materialize:\n$plan")
    assert(census.collect().length == 4)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dirPath.toFile)
  }

  test("PqIndex.ensure records the build-time gradedness verdict in the " +
      "index manifest, discriminating both corpus shapes (r15 verdict item 3)") {
    val hm = spark.read.parquet(graft.layouts.PqIndex.ensure(
      spark, "preflight_hier_spec", corpus(hier), dims,
      k = nclust, iters = 2, m = m, kpq = k, pqIters = 4).manifest).head
    assert(hm.schema.fieldNames.toSeq == Seq("sample_cells", "graded_cells",
      "degenerate_cells", "insufficient_cells", "min_ratio", "m", "kpq",
      "nlist", "dims"))
    assert(hm.getInt(0) == 4 && hm.getLong(1) == 4
      && hm.getLong(2) == 0 && hm.getLong(3) == 0, s"hier manifest: $hm")
    assert(hm.getDouble(4) >= 2.0, s"graded cells imply min_ratio >= 2: $hm")
    assert((hm.getInt(5), hm.getInt(6), hm.getInt(7), hm.getInt(8))
      == ((m, k, nclust, dims)))
    val fm = spark.read.parquet(graft.layouts.PqIndex.ensure(
      spark, "preflight_flat_spec", corpus(flat), dims,
      k = nclust, iters = 2, m = m, kpq = k, pqIters = 4).manifest).head
    assert(fm.getLong(2) == 4 && fm.getLong(1) == 0, s"flat manifest: $fm")
  }

  test("registry row: deterministic across reruns, schema-stable, " +
      "verdict column populated") {
    val sf = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("llm_ann_recall_floor")(spark, sf).collect()
    val b = SparkEntry.queries("llm_ann_recall_floor")(spark, sf).collect()
    assert(a.nonEmpty)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(r => Set("graded", "degenerate")(r.getString(8))))
    assert(a.forall(r => r.getLong(1) > 0))
    // recon quality is a real cosine
    assert(a.forall(r => r.getDouble(6) >= -1.0 - 1e-9 && r.getDouble(6) <= 1.0 + 1e-9))
  }
}
