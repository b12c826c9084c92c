package graft.layouts

import graft.etl.{Ivf, Pq}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF+PQ index — the complete resident format of a 100 TB
  * vector table (Jégou et al. 2011 §V composed with [[IvfIndex]]'s
  * partition layout): rows are (vec_id, codes, recon_norm2, members)
  * PARTITIONED BY cent_id, so a probe query's `cent_id IN (...)` prunes
  * to the probed directories before a file is opened, and inside a cell
  * the scan reads m-byte-scale codes instead of d floats. The quantizer
  * models (IVF centroids + PQ codebooks) persist as parquet sidecars —
  * a query loads a few KB of model, prunes, and does m lookups per row.
  *
  * Dedup-first like [[IvfIndex]]: the index stores identity-group
  * representatives with their member lists; top-k over reps covers the
  * true top-k (the vecGroups proof in LlmOps).
  *
  * Build caching follows the hardened ZOrder convention: MD5 cache tag
  * and ALL artifacts' _SUCCESS markers gate the rebuild (a crash between
  * writes can never serve a half-built index). */
object PqIndex {

  /** Codes/centroids/codebooks parquet paths for `corpus` (vec_id, v)
    * under cache key `tag`. Builds on first call, else serves the cached
    * layout. */
  def ensure(s: SparkSession, tag: String, corpus: => DataFrame, dims: Int,
      k: Int = 16, iters: Int = 2, m: Int = 8, kpq: Int = 16, pqIters: Int = 4,
      ivfSampleCap: Int = Int.MaxValue, pqSampleCap: Int = Int.MaxValue)
      : (String, String, String) = {
    // caps join the cache key only when set, so default callers keep
    // their r14 layout ids (no rebuild churn)
    val capTag =
      (if (ivfSampleCap != Int.MaxValue) s"_ic$ivfSampleCap" else "") +
        (if (pqSampleCap != Int.MaxValue) s"_pc$pqSampleCap" else "")
    val id = LayoutUtil.cacheId(s"${tag}_${dims}_${k}_${iters}_${m}_${kpq}_$pqIters$capTag")
    val root = LayoutUtil.artifactRoot(s)
    val codesPath = s"$root/graft_pq_idx_$id"
    val centsPath = s"$root/graft_pq_cents_$id"
    val booksPath = s"$root/graft_pq_books_$id"
    val complete = Seq(codesPath, centsPath, booksPath)
      .forall(p => LayoutFs.existsAt(s"$p/_SUCCESS"))
    if (!complete) {
      Seq(codesPath, centsPath, booksPath).foreach(LayoutFs.deleteDirAt)
      // the group artifact materializes once: encode's argmin projection
      // must not fuse into the aggregate's output method (the Janino
      // 64 KB fusion note on llm_embed_pq)
      val grouped = LayoutUtil.repsWithMembers(corpus).localCheckpoint()
      try {
        val reps = grouped.select(col("vec_id"), col("v"))
        val cents = Ivf.train(reps, k, iters, ivfSampleCap)
        val books = Pq.train(reps, dims, m, kpq, pqIters, pqSampleCap)
        Pq.encodeWithStats(Ivf.assign(reps, cents), dims, books)
          .join(grouped.select(col("vec_id"), col("members")), "vec_id")
          .select(col("vec_id"), col("cent_id"), col("codes"),
            col("recon_norm2"), col("members"))
          .repartition(k, col("cent_id"))
          .write.partitionBy("cent_id").mode("overwrite").parquet(codesPath)
        cents.write.mode("overwrite").parquet(centsPath)
        val session = s
        import session.implicits._
        books.zipWithIndex.flatMap { case (book, j) =>
          book.map { case (cid, cv) => (j, cid, cv) }
        }.toDF("sub", "cid", "cv").write.mode("overwrite").parquet(booksPath)
        // release the checkpoint blocks now that every artifact is on disk
        // (the Ivf.train persist lifecycle — without this, callers outside
        // the bench leak the blocks for the rest of the session)
      } finally grouped.unpersist(blocking = false)
      // a rebuild at an existing path (crashed half-build) must not be
      // served from a pre-rebuild cached listing
      Seq(codesPath, centsPath, booksPath).foreach(LayoutUtil.evictServed)
    }
    (codesPath, centsPath, booksPath)
  }

  /** The codes (or sidecar) relation with its file listing CACHED for
    * the session — the [[IvfIndex.serve]] twin for the PQ layout; same
    * contract (immutable ensure() outputs; pruning evaluates per query
    * against the cached listing; evictServed for in-place mutation). */
  def serve(s: SparkSession, path: String): DataFrame =
    LayoutUtil.servedRelation(s, path)

  /** STREAMING index maintenance — the [[IvfIndex.appendStream]] parity
    * for the PQ layout: assign + encode are both map-side literal
    * expressions (centroids and codebooks are frozen model params), so
    * they apply to a streaming DataFrame unchanged, and every micro-batch
    * lands its CODES (never float vectors) inside the cent_id= partition
    * directories. The growing index stays probe-prunable and
    * ADC-servable with zero reshuffling of the stream; model retraining
    * is a batch concern (rebuild via [[ensure]] with a new tag and swap
    * paths), and batch-file compaction is [[IvfIndex.compact]] applied to
    * this root. vecs must have (vec_id, v); written rows are
    * (vec_id, codes, recon_norm2) partitioned by cent_id.
    *
    * KEEP STREAMED AND BATCH-BUILT INDEXES IN SEPARATE ROOTS (the
    * IvfIndex.appendStream contract): [[ensure]]'s rows additionally
    * carry the identity-group `members` column, so mixing the two
    * schemas in one root leaves the resolved schema dependent on which
    * footer the reader samples. Collapsing streamed raw vectors into
    * representative rows is the batch compaction's job. */
  def appendStream(vecs: DataFrame, cents: DataFrame, books: Seq[Pq.Codebook],
      dims: Int, codesPath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    Pq.encodeWithStats(Ivf.assign(vecs, cents), dims, books)
      .select(col("vec_id"), col("cent_id"), col("codes"), col("recon_norm2"))
      .writeStream.format("parquet")
      .option("path", codesPath)
      .option("checkpointLocation", checkpoint)
      .partitionBy("cent_id")
      .outputMode("append")
      .start()

  /** Codebooks back from the sidecar, in [[Pq.train]]'s shape (listing
    * served through the session cache — per-query model loads pay the
    * KB-scale collect, not a re-list). */
  def loadBooks(s: SparkSession, booksPath: String): Seq[Pq.Codebook] =
    serve(s, booksPath)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.map(r => (r._2, r._3)).sortBy(_._1).toSeq }
}
