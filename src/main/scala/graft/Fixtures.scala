package graft

import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Planted-mutant FIXTURE corpora for the no-oracle / closure dedup rows,
  * written once as parquet and cached by source size+mtime (the layouts
  * convention) — so the registry rows are PURE OPERATORS over a parquet
  * input: nothing synthetic is manufactured inside the timed query, and
  * the bench reports fixture builds as separate line items.
  *
  * Path stability: the directory name carries the sf-dir BASENAME only
  * (`/tmp/graft_fixture_<name>_<basename>`), because the clusters oracle
  * SQL must reference the same files from DuckDB as a static string (the
  * driver oracles at sf0.01). Staleness is handled INSIDE the directory:
  * a `_graft_sig` sidecar records the source signature + fixture version,
  * and any mismatch rebuilds in place. The Spark query always runs before
  * the DuckDB compare (the driver dumps parquet first), so the oracle
  * never reads a stale or missing fixture.
  */
object Fixtures {

  /** Bump when a fixture's DERIVATION changes, so cached parquet from an
    * older definition can never serve the new query. */
  private val FixtureVersion = 1

  private def ensure(s: SparkSession, dir: String, name: String)
      (build: => DataFrame): String = {
    val src = new java.io.File(s"$dir/documents.parquet")
    val sig = s"v$FixtureVersion|${layouts.ZOrder.sourceSig(src)}"
    val base = new java.io.File(dir).getName
    val path = s"/tmp/graft_fixture_${name}_$base"
    val sigFile = java.nio.file.Paths.get(s"$path/_graft_sig")
    val fresh = new java.io.File(s"$path/_SUCCESS").exists &&
      java.nio.file.Files.exists(sigFile) &&
      new String(java.nio.file.Files.readAllBytes(sigFile)) == sig
    if (!fresh) {
      build.write.mode("overwrite").parquet(path)
      java.nio.file.Files.writeString(sigFile, sig)
    }
    path
  }

  /** llm_dedup_minhash input: the documents corpus + one-word mutants of
    * every 25th doc (id + 1e6, first word replaced) — the planted pairs
    * the banded LSH pass must rediscover. Columns (id, text). */
  def neardupCorpus(s: SparkSession, dir: String): String =
    ensure(s, dir, "neardup") {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val mutants = docs.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          regexp_replace(col("text"), "^\\w+ ", "graftmutant ").as("text"))
      docs.unionByName(mutants).select(col("doc_id").as("id"), col("text"))
    }

  /** llm_dedup_clusters input: the documents corpus + near-dup CHAINS —
    * for every 50th (≥30-word) doc, mutant A perturbs words 10–14 and
    * mutant B perturbs 10–14 AND 20–24, so B shares A's neighborhood but
    * (on shorter docs) not the original's: a~b~c that only the transitive
    * closure collapses. Columns (doc_id, source, text). */
  def clusterCorpus(s: SparkSession, dir: String): String =
    ensure(s, dir, "cluster") {
      val base = Tables.documents(s, dir).select(col("doc_id"), col("source"), col("text"))
      val words = split(TextOps.normalize(col("text")), " ")
      val eligible = base.filter(col("doc_id") % 50 === 0 && size(words) >= 30)
      val mutA = eligible.select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
        concat_ws(" ", transform(words, (w, i) =>
          when(i.between(9, 13), lit("graftmuta")).otherwise(w))).as("text"))
      val mutB = eligible.select((col("doc_id") + 2000000L).as("doc_id"), col("source"),
        concat_ws(" ", transform(words, (w, i) =>
          when(i.between(9, 13), lit("graftmuta"))
            .when(i.between(19, 23), lit("graftmutb")).otherwise(w))).as("text"))
      base.unionByName(mutA).unionByName(mutB)
    }
}
