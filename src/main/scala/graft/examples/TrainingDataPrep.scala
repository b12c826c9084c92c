package graft.examples

import graft.etl.TextDedup
import graft.functions.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation — the composed job the LLM
  * operator family exists FOR, in the order a 100 TB crawl actually runs
  * them (each stage shrinks the data the next one touches):
  *
  *   1. EXACT dedup (cheapest: one shuffle on the raw text, keep min id) —
  *      the op-69 precondition every later stage relies on.
  *   2. Quality filter (map-side: TextOps.qualityFeatures — the exact
  *      formula the driver oracles via llm_quality_score) ≥ `qualityMin`.
  *   3. NEAR-dup removal over the survivors: MinHash+LSH candidate pairs
  *      (TextDedup.minhashPairs, never all-pairs), exact-Jaccard-verified
  *      at `neardupThreshold`; of each duplicate pair the larger doc_id is
  *      dropped (keep-first — the same arrival-order rule the streaming
  *      twin applies). Pair-graph note: keep-first by pair is the standard
  *      greedy pass — a doc is dropped iff it pairs with some smaller
  *      surviving doc; transitive near-dup CHAINS (a~b, b~c, a≁c) can keep
  *      endpoints a and c, which is the documented, deterministic choice.
  *   4. Token accounting over the kept set: whitespace tokens + the
  *      chars/4 BPE estimate per doc, plus corpus totals.
  *
  * Everything before the near-dup band join is map-side or one shuffle;
  * stage order is the 100 TB design: exact dedup removes the mass (web
  * crawls are duplicate-heavy), quality drops junk BEFORE signatures are
  * computed, and the LSH pass runs on the smallest surviving set.
  *
  * Outputs: `kept` (doc_id, lang, n_tokens, quality, bpe_est),
  * `dropped` (doc_id, stage it died in), and `attrition` — one row per
  * stage with docs in/out and surviving token volume, the corpus-curation
  * report a data-engineering run ends with.
  */
object TrainingDataPrep {

  final case class Outputs(kept: DataFrame, dropped: DataFrame, attrition: DataFrame)

  /** Prepare a corpus given as (doc_id, lang, text) rows. */
  def prepare(docsIn: DataFrame,
      qualityMin: Double = 0.45, neardupThreshold: Double = 0.8): Outputs = {
    val docs = docsIn.select(col("doc_id"), col("lang"), col("text"))

    // 1. exact dedup: keep the smallest doc_id per raw text (group by the
    // content itself — no hash pass; map-side partials shrink the shuffle
    // to the distinct set)
    val exactKept = docs
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val s1 = docs.join(exactKept, "doc_id")
      // two downstream stages and the attrition count branch from this
      // survivor set (the op-60 materialization point)
      .cache()

    // 2. quality filter — the oracled formula, map-side
    val scored = s1.withColumn("q", TextOps.qualityFeatures(col("text")))
    val s2 = scored.filter(col("q.quality") >= qualityMin).cache()

    // 3. near-dup removal on survivors: LSH candidates + exact Jaccard,
    // drop the larger id of each verified pair
    val dupIds = TextDedup.minhashPairs(
        s2.select(col("doc_id").as("id"), col("text")),
        shingleWords = 5, nHashes = 64, nBands = 16, rowsPerBand = 4,
        threshold = neardupThreshold)
      .select(col("doc_b").as("doc_id")).distinct()
    val s3 = s2.join(dupIds, Seq("doc_id"), "left_anti").cache()

    // 4. token accounting
    val kept = s3.select(
      col("doc_id"), col("lang"),
      col("q.n_tokens").as("n_tokens"), col("q.quality").as("quality"),
      ceil(length(col("text")).cast("double") / 4.0).cast("long").as("bpe_est"))

    val dropped =
      docs.join(exactKept, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), lit("exact_dup").as("stage"))
      .unionByName(scored.filter(col("q.quality") < qualityMin)
        .select(col("doc_id"), lit("low_quality").as("stage")))
      .unionByName(s2.join(dupIds, "doc_id")
        .select(col("doc_id"), lit("near_dup").as("stage")))

    def stageRow(name: String, ord: Int, in: DataFrame, out: DataFrame) = {
      val tokens = out.select(
        sum(size(split(TextOps.normalize(col("text")), " "))).as("tokens_out"))
      in.select(count(lit(1)).as("docs_in"))
        .crossJoin(out.select(count(lit(1)).as("docs_out")))
        .crossJoin(tokens)
        .select(lit(ord).as("stage_ord"), lit(name).as("stage"),
          col("docs_in"), col("docs_out"), col("tokens_out"))
    }
    val attrition =
      stageRow("exact_dedup", 1, docs, s1)
        .unionByName(stageRow("quality_filter", 2, s1, s2.drop("q")))
        .unionByName(stageRow("neardup_removal", 3, s2.drop("q"), s3.drop("q")))

    Outputs(kept, dropped, attrition)
  }
}
