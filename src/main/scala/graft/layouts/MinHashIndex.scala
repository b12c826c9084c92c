package graft.layouts

import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted banded-MinHash signature index of a text corpus — the
  * INCREMENTAL-INGEST answer to near-dup dedup at 100 TB: pay the
  * signature pass over the corpus ONCE, then dedup every new crawl batch
  * against the index without rescanning or re-hashing the corpus. The
  * batch side computes its own signatures map-side (it is the small
  * side), joins the band table on the band key, and verifies candidates
  * with exact Jaccard — the same shape the ANN family uses for vectors
  * (IvfIndex/PqIndex: persisted cent_id layouts probed by new queries).
  *
  * Two bucketed tables per (dir, tag):
  *   - `mhidx_<tag>_bands`(bkey string, rep bigint) — one row per
  *     (band, dedup-group representative), bucketed+sorted by bkey, so
  *     the candidate join is a zero-index-shuffle sort-merge join (only
  *     the batch's band rows shuffle — KBs, not the corpus).
  *   - `mhidx_<tag>_reps`(rep bigint, norm string) — the representative
  *     texts, bucketed by rep: candidate verification fetches ONLY the
  *     touched reps' texts by id and recomputes their shingles, never
  *     scanning the raw corpus.
  *
  * The band key is stored as the HUMAN-AUDITABLE string
  * `<band_idx>:<sig[4b]>,<sig[4b+1]>,…` rather than a 64-bit hash of the
  * slice: byte-exactly reproducible by the DuckDB oracle (the
  * llm_dedup_minhash JVM-twin convention), collision-free by
  * construction. A production deployment would store
  * xxhash64(band_idx, slice) to shave the key to 8 bytes — the probe
  * plan is identical.
  *
  * Index rows are IDS-ONLY (the embed_neardup lesson): dedup-first
  * groups by NORMALIZED text, so k exact copies contribute ONE band row
  * set, and the index never carries shingle arrays or signatures.
  *
  * Cache note: layouts are keyed by Bucketed.ensure's content signature
  * of `srcTables` under `dir` (plus spec schema), so regenerated
  * testdata rotates the index. A corpus built from a FIXTURE parquet
  * must still declare the fixture's source table(s) — the fixture is a
  * deterministic function of those plus graft.Fixtures.FixtureVersion,
  * which bumps whenever fixture-construction logic changes. */
object MinHashIndex {

  /** Band rows (bkey, rep) + rep texts (rep, norm) for `corpus` (id,
    * text), dedup-first on the normalized text. */
  private[graft] def bandRows(corpus: DataFrame, shingleWords: Int,
      nHashes: Int, nBands: Int, rowsPerBand: Int): (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val reps = corpus
      .withColumn("norm", TextOps.normalize(col("text")))
      .groupBy(col("norm")).agg(min(col("id")).as("rep"))
    val bands = reps
      .withColumn("sig", expr(s"minhash_sig(word_shingles(norm, $shingleWords), $nHashes)"))
      .select(col("rep"), posexplode(transform(
        sequence(lit(0), lit(nBands - 1)),
        b => array_join(
          slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)).cast("array<string>"), ","))))
      .select(concat(col("pos").cast("string"), lit(":"), col("col")).as("bkey"),
        col("rep"))
    (bands, reps.select(col("rep"), col("norm")))
  }

  /** Ensure the index layout exists; returns (bandsTable, repsTable)
    * fully qualified for `spark.table`.
    *
    * `tag` must encode the corpus DEFINITION, not just its sources:
    * Bucketed.ensure's cache signature covers the source tables' bytes
    * and the spec's name/key/schema, but NOT the filter that selected
    * `corpus` from them — two callers indexing different subsets of the
    * same table under one tag would silently share a layout. */
  def ensure(s: SparkSession, dir: String, corpus: DataFrame, tag: String,
      shingleWords: Int, nHashes: Int, nBands: Int, rowsPerBand: Int,
      srcTables: Seq[String]): (String, String) = {
    val (bands, reps) = bandRows(corpus, shingleWords, nHashes, nBands, rowsPerBand)
    val Seq(b, r) = Bucketed.ensure(s, dir, Seq(
      Bucketed.Spec(s"mhidx_${tag}_bands", bands, "bkey", srcTables),
      Bucketed.Spec(s"mhidx_${tag}_reps", reps, "rep", srcTables)))
    (b, r)
  }
}
