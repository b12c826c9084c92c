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
