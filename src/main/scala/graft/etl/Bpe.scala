package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Byte-pair-encoding tokenizer TRAINING as a distributed pipeline — the
  * real algorithm (Sennrich et al. 2016; the GPT-2 tokenizer's shape), not
  * a regex approximation: repeatedly count adjacent symbol pairs over the
  * WORD-TYPE frequency table, merge the globally most frequent pair, stop
  * after `nMerges` rounds. Tie-breaks are total-ordered (count desc, then
  * pair lexicographic under Spark's UTF-8 BINARY collation — byte order,
  * which differs from Java's UTF-16 ordering on supplementary-plane
  * characters; BpeSpec's JVM reference compares UTF-8 bytes to match) so
  * training is deterministic on any cluster.
  *
  * 100 TB shape: everything runs over word TYPES weighted by frequency,
  * never over the corpus — the type table is Heaps-law small relative to
  * the token stream (and exactly what reference BPE trainers hold in
  * memory; here it is a DataFrame, so it may exceed memory freely). Each
  * round is ONE pair-count aggregation (map-side combined, shuffled on
  * the pair) plus a map-only merge rewrite; the learned model is k merge
  * rules on the driver (model parameters, the Ivf convention). Each round
  * materializes its rewrite (persist + count) so round N's job does not
  * re-run rounds 1..N−1 — the standard iterative-algorithm pitfall
  * Ivf.train documents.
  */
object Bpe {

  /** Word → its character symbols. `split(w, "")` keeps a trailing empty
    * string under Spark's limit=-1 semantics — filter it out. */
  def chars(w: Column): Column =
    filter(split(w, ""), c => c =!= lit(""))

  /** One BPE merge rewrite: replace each left-to-right non-overlapping
    * adjacent (a, b) with the fused symbol. The fold mirrors the greedy
    * scan reference trainers use: a freshly fused symbol does not
    * re-combine with the following symbol in the same round. */
  def mergeStep(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast(ArrayType(StringType)),
      (acc, x) => when(
        coalesce(try_element_at(acc, lit(-1)) === lit(a), lit(false)) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Learn `nMerges` merge rules from a (w, cnt) word-frequency table. */
  def train(wordFreq: DataFrame, nMerges: Int): Seq[(String, String)] = {
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var words = wordFreq.select(chars(col("w")).as("syms"), col("cnt")).persist()
    words.count()
    try {
      var exhausted = false
      for (_ <- 1 to nMerges if !exhausted) {
        val best = words
          .select(col("cnt"), explode(zip_with(
            slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("cnt")).as("n"))
          .orderBy(col("n").desc, col("a").asc, col("b").asc)
          .limit(1).collect()
        if (best.isEmpty) exhausted = true
        else {
          val (a, b) = (best.head.getString(0), best.head.getString(1))
          merges += ((a, b))
          val next = words
            .select(mergeStep(col("syms"), a, b).as("syms"), col("cnt")).persist()
          next.count()
          words.unpersist(blocking = false)
          words = next
        }
      }
      merges.toSeq
    } finally words.unpersist(blocking = false)
  }

  /** Segment distinct words (column `w`) with an ordered merge list —
    * map-only; meant to run over the word-TYPE table and be joined back
    * to the corpus (dedup-first), never applied per token. */
  def segment(distinctWords: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(distinctWords.withColumn("syms", chars(col("w"))))(
      (df, m) => df.withColumn("syms", mergeStep(col("syms"), m._1, m._2)))
}
