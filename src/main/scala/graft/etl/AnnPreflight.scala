package graft.etl

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GRADEDNESS PREFLIGHT for PQ-coded ANN — the r14 design-point probe's
  * negative result productized (`llm_ann_recall_floor`): a corpus whose
  * in-cell similarity profile is DEGENERATE (every candidate at the same
  * cosine ± i.i.d. noise, no graded near tier) silently destroys PQ
  * recall at ANY code budget — measured r14 (CROSSOVER): ADC recall
  * 0.02–0.08 on flat-cluster white noise, monotonically WORSE with more
  * probes, while the same quantizer config scores 1.000 on a
  * hierarchical corpus. The failure is a property of the DATA, not of
  * m/k/nprobe, so a deployment must detect it BEFORE building a
  * billion-vector index and burning a cluster-day on an encode whose
  * shortlists will be noise. Lives in the etl layer with the quantizers
  * it diagnoses ([[Ivf]]/[[Pq]]) so [[graft.layouts.PqIndex]] can run it
  * at build time without a layouts→operators dependency; the operator
  * surface (`LlmOps.annRecallFloor`) forwards here.
  *
  * Method, per sampled IVF cell (cells are the ADC scan unit, so the
  * verdict is measured exactly where the scan runs): probe = the cell's
  * lowest-id member; score every other member with (a) the exact cosine
  * kernel and (b) the ADC approximation through the CONFIGURED
  * quantizer, then compare two numbers —
  *   margin    = mean(top-`topTier` exact cosines) − median(exact
  *               cosine): how far the near tier stands above the bulk;
  *   quant_err = median |exact − adc|: the score noise quantization
  *               injects at this m/k on this data.
  * ADC ordering can only resolve structure the margin keeps above the
  * noise: `graded` requires margin ≥ 2 × quant_err (the factor keeps a
  * p50 noise estimate honest against its own tail); anything else is
  * `degenerate` — expect shortlist recall to collapse, and either serve
  * float scans or re-examine the embedding pipeline. The emitted
  * `recon_cos_p50` (median cos(v, v̂) from the encode's carried stats)
  * separates the two degenerate causes: HIGH recon with a degenerate
  * verdict says the DATA has no grade (r14's flat-noise corpus); LOW
  * recon says m is too small for these dims (r14's m=16-at-768 row).
  * A sampled cell whose ONLY member is its probe has nothing to score:
  * it emits an explicit `insufficient_members` row (members=0, null
  * metrics) instead of silently vanishing from the output (r15 ADVICE —
  * callers counting rows or scanning verdicts must see every sampled
  * cell).
  *
  * 100 TB shape (r16 — the r15 form localCheckpoint()ed the FULL
  * assigned corpus, an executor-disk wall the r15 verdict named): the
  * cell census runs over `assign(...).select("cent_id")` — assignment is
  * map-side (centroids ride as one literal), the projection lets column
  * pruning reach the scan, and NOTHING materializes; the members pass
  * recomputes the map-side assign (deterministic) and persists ONLY the
  * K-cell-filtered members, so executor storage is sample-bounded —
  * K × (corpus/nlist)-ish rows — regardless of corpus size, and the
  * persist is released before the call returns (the result is K local
  * rows). The shuffles are one cell-census aggregate and one window
  * PARTITIONED BY cell over only the sampled members; the exact
  * percentile sorts within those groups alone. */
object AnnPreflight {

  /** Output schema — metric columns nullable for the
    * `insufficient_members` rows. */
  private[graft] val schema = StructType(Seq(
    StructField("cent_id", LongType, nullable = false),
    StructField("members", LongType, nullable = false),
    StructField("top_tier_cos", DoubleType, nullable = true),
    StructField("bulk_cos", DoubleType, nullable = true),
    StructField("margin", DoubleType, nullable = true),
    StructField("quant_err", DoubleType, nullable = true),
    StructField("recon_cos_p50", DoubleType, nullable = true),
    StructField("ratio", DoubleType, nullable = true),
    StructField("verdict", StringType, nullable = false)))

  /** The census plan — the K LARGEST cells (ties → lowest cent_id):
    * deterministic, and the cells where most probe traffic lands.
    * Package-visible so the spec can pin the scale property: the
    * cent_id-only projection lets column pruning reach the scan (v is
    * the one column assignment needs; vec_id and everything else prune
    * away) and the plan carries no checkpoint/persist — the census is a
    * pure map-side pass however large the corpus. */
  private[graft] def cellCensus(vecs: DataFrame, centsRel: DataFrame,
      sampleCells: Int): DataFrame =
    Ivf.assign(vecs, centsRel)
      .select(col("cent_id"))
      .groupBy(col("cent_id")).count()
      .orderBy(col("count").desc, col("cent_id").asc)
      .limit(sampleCells)

  /** See object scaladoc. Returns K(=`sampleCells`) LOCAL rows — the
    * preflight is a diagnostic, its result is driver-resident by
    * design, and materializing it eagerly lets the sample-bounded
    * members persist release before the call returns (no storage leaks
    * into the caller's session).
    *
    * PRECONDITION: `vecs` must be a DETERMINISTIC plan — it is evaluated
    * twice (the census pass and the members pass re-run `Ivf.assign`
    * instead of materializing the full corpus, which is the whole
    * scale-hygiene point). A nondeterministic source (sample,
    * monotonically_increasing_id, shuffle-order-dependent ids) can make
    * the census cells disagree with the second pass's membership and
    * silently skew probe selection; such callers must persist/checkpoint
    * their projection before calling (r16 ADVICE — all in-repo callers
    * are deterministic). */
  def recallFloor(vecs: DataFrame, books: Seq[Pq.Codebook],
      cents: Seq[(Long, Seq[Double])], dims: Int,
      sampleCells: Int = 4, topTier: Int = 10): DataFrame = {
    val s = vecs.sparkSession
    GraftFunctions.register(s)
    val session = s
    import session.implicits._
    val centsRel = cents.toDF("cent_id", "cv")
    val cells = cellCensus(vecs, centsRel, sampleCells)
      .collect().map(_.getLong(0)).toSeq
    require(cells.nonEmpty,
      "ann_recall_floor: empty corpus — nothing to preflight")
    // recompute the map-side assign (deterministic — same centroids,
    // same rounded-cosine total order) and keep ONLY the sampled cells;
    // this, not the full corpus, is what persists for the two consumers
    // (probe agg + scored scan)
    val members = Ivf.assign(vecs, centsRel)
      .filter(col("cent_id").isin(cells: _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // one probe vector per cell, driver-resident (K × dims doubles —
      // the model-literal convention); min_by is deterministic, vec_id
      // is unique
      val probes: Map[Long, (Long, Seq[Double])] = members
        .groupBy(col("cent_id"))
        .agg(min(col("vec_id")).as("probe_id"),
          min_by(col("v"), col("vec_id")).as("qv"))
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getSeq[Double](2)))).toMap
      // per-cell model-literal dispatch: each branch is null off its
      // cell, coalesce picks the matching one
      def perCell(f: (Long, Seq[Double]) => Column): Column =
        coalesce(cells.map(c =>
          when(col("cent_id") === c, f(probes(c)._1, probes(c)._2))): _*)
      val coded = Pq.encodeWithStats(members, dims, books)
      val scored = coded
        .filter(col("vec_id") =!= perCell((pid, _) => lit(pid)))
        .select(col("cent_id"), col("vec_id"),
          perCell((_, qv) =>
            round(call_function("cosine_fast", col("v"), typedlit(qv)), 6))
            .as("exact_cos"),
          perCell((_, qv) => Pq.adcCosCol(books, qv)).as("adc_cos"),
          // quantizer reconstruction quality per member: cos(v, v̂) from
          // the encode's carried stats — the m-budget diagnostic (a
          // degenerate verdict with HIGH recon_cos says "the data has no
          // grade"; with LOW recon_cos it says "m is too small for these
          // dims" — r14's two failure modes)
          round(when(col("recon_norm2") === 0.0, 0.0).otherwise(
            col("recon_dot") /
              (sqrt(call_function("dot_fast", col("v"), col("v"))) *
                sqrt(col("recon_norm2")))), 6)
            .as("recon_cos"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("cent_id"))
            .orderBy(col("exact_cos").desc, col("vec_id").asc)))
      // order-independent mean over the (≤ topTier)-row tier: exact
      // high-precision decimal sum, one double division (the Det.davg
      // shape at cosine precision)
      def cavg(c: Column): Column =
        sum(c.cast(DecimalType(28, 12))).cast("double") / count(c).cast("double")
      val have = scored.groupBy(col("cent_id"))
        .agg(count(lit(1)).as("members"),
          cavg(when(col("rn") <= topTier, col("exact_cos"))).as("tier"),
          expr("percentile(exact_cos, 0.5)").as("bulk"),
          expr("percentile(abs(exact_cos - adc_cos), 0.5)").as("qerr"),
          expr("percentile(recon_cos, 0.5)").as("recon"))
        .select(col("cent_id"), col("members"),
          round(col("tier"), 6).as("top_tier_cos"),
          round(col("bulk"), 6).as("bulk_cos"),
          round(col("tier") - col("bulk"), 6).as("margin"),
          round(col("qerr"), 6).as("quant_err"),
          round(col("recon"), 6).as("recon_cos_p50"),
          round((col("tier") - col("bulk")) / greatest(col("qerr"), lit(1e-6)), 3)
            .as("ratio"))
        .withColumn("verdict",
          when(col("margin") >= lit(2.0) * col("quant_err"), lit("graded"))
            .otherwise(lit("degenerate")))
        .collect()
      // cells whose only member is the probe contribute zero scored rows
      // — surface them instead of dropping them (r15 ADVICE)
      val haveIds = have.map(_.getLong(0)).toSet
      val missing = cells.filterNot(haveIds).map(cid =>
        Row(cid, 0L, null, null, null, null, null, null, "insufficient_members"))
      val rows = (have.toSeq ++ missing).sortBy(_.getLong(0))
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.asJava, schema)
    } finally members.unpersist(blocking = false)
  }
}
