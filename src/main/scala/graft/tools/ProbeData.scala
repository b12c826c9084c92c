package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared scaffolding for the MinHashIndex measurement probes
  * (IncrementalProbe, FragmentationProbe): the corpus/fixed-batch split
  * of the neardup fixture, the corpus-scaled bucket geometry, and the
  * `dir[:buckets]` arg convention — ONE definition, so the probes can
  * never silently measure different geometries. */
private[tools] object ProbeData {

  /** `path[:buckets]` → (path, explicit bucket count). */
  def parseDirSpec(spec: String): (String, Option[Int]) = spec.split(":") match {
    case Array(d, b) => (d, Some(b.toInt))
    case Array(d)    => (d, None)
  }

  /** The neardup fixture split: (full corpus, FIXED std batch). The
    * batch is replica-0-only (mutants + planted copies) so it stays
    * constant-size at every corpus scale — the fixed-batch contract the
    * incremental measurements rest on. */
  def corpusAndBatch(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val all = spark.read.parquet(graft.Fixtures.neardupCorpus(spark, dir))
    val repLocal = col("id") % 1000000000L
    val corpus = all.filter(repLocal < 1000000L)
    val batch = all.filter(col("id") < 1000000000L && repLocal >= 1000000L)
      .unionByName(corpus.filter(col("id") < 1000000000L && col("id") % 40 === 0)
        .select((col("id") + 2000000L).as("id"), col("text")))
    (corpus, batch)
  }

  /** Distinct normalized-text rep count of `corpus` (the index row
    * count driver). */
  def repCount(corpus: DataFrame): Long = corpus
    .withColumn("norm", graft.functions.TextOps.normalize(col("text")))
    .select(col("norm")).distinct().count()

  /** Corpus-scaled bucket count: ~16 k band rows (≈256 KB) per bucket
    * file, floored at 64 and rounded up to a power of two — file size
    * stays constant as the corpus grows, the 100 TB file-count geometry
    * in miniature. */
  def scaledBuckets(nReps: Long): Int = {
    val want = math.max(64L, nReps * 16 / 16384)
    Integer.highestOneBit(math.min(want, 1 << 20).toInt) match {
      case b if b.toLong < want => b * 2
      case b => b
    }
  }
}
