package graft.streaming

import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection with LSH-bucket state (the streaming
  * twin of `TextDedup.minhashPairs`): incoming documents are MinHash-signed
  * map-side, exploded to one row per LSH band, and grouped by
  * (band, bucket) into `flatMapGroupsWithState` — the state per bucket is
  * the (bounded) set of documents seen in that bucket, and each arrival is
  * compared against exactly its bucket co-residents, never the corpus.
  *
  * Batch near-dup can verify candidates with exact Jaccard because both
  * shingle sets are at hand; a stream cannot keep every past document's
  * shingle set. The streaming contract is therefore ESTIMATED Jaccard —
  * the fraction of agreeing MinHash components, the unbiased estimator the
  * signature exists for (±1/√64 ≈ 0.125 std at 64 hashes). Pairs at the
  * decision boundary can differ from the exact-verified batch answer;
  * planted high-similarity pairs cannot (StreamingNearDupSpec pins both
  * properties, and that batch/stream deliveries of the same corpus agree).
  *
  * State bound: `maxPerBucket` first-arrived docs per bucket (64 default).
  * A bucket is a band-width slice of signature space — under LSH's
  * precondition (exact dups removed upstream: stream_dedup_stateful) real
  * buckets are small, and the cap turns an adversarial hot bucket into
  * bounded state + bounded per-event work instead of unbounded quadratic
  * blowup — the streaming analogue of `TextDedup.cappedBlocks`. Each
  * stored doc costs 8 B id + 64×8 B signature ≈ 0.5 KB → ≤ 33 KB per
  * bucket state row.
  *
  * 100 TB/stream note: the one shuffle is on (band, bucket) — the same
  * key the batch pass shuffles on; state lives in the state store
  * (RocksDB at scale), partitioned by that key, and an event's work is
  * O(bucket occupancy) comparisons of 64-long signatures.
  */
object StreamingNearDup {

  case class BandRow(doc_id: Long, sig: Seq[Long], band: Int, bucket: Long)
  case class StoredDoc(doc_id: Long, sig: Seq[Long])
  case class BucketState(docs: List[StoredDoc])
  case class CandPair(doc_a: Long, doc_b: Long, est_jaccard: Double)

  val MaxPerBucket = 64

  /** Map-side signature + band explosion over (doc_id, text) rows — shared
    * verbatim by the batch twin and the streaming query (the EventPipelines
    * one-API design point). */
  def bandRows(docs: DataFrame, shingleWords: Int = 5, nHashes: Int = 64,
      nBands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    require(nBands * rowsPerBand == nHashes, "bands*rows must equal signature length")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .withColumn("norm", TextOps.normalize(col("text")))
      .withColumn("sig", expr(s"minhash_sig(word_shingles(norm, $shingleWords), $nHashes)"))
      .select(col("doc_id"), col("sig"),
        posexplode(TextOps.lshBands(col("sig"), nBands, rowsPerBand)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      .select("doc_id", "sig", "band", "bucket")
  }

  /** Estimated Jaccard = fraction of agreeing signature components. */
  def estJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    val n = math.min(a.length, b.length)
    if (n == 0) 0.0
    else {
      var agree = 0
      var i = 0
      while (i < n) { if (a(i) == b(i)) agree += 1; i += 1 }
      agree.toDouble / n
    }
  }

  private def update(threshold: Double)(
      key: (Int, Long), rows: Iterator[BandRow],
      state: GroupState[BucketState]): Iterator[CandPair] = {
    var stored = state.getOption.map(_.docs).getOrElse(Nil)
    val out = scala.collection.mutable.ListBuffer.empty[CandPair]
    // sort within the batch: emission order (and, under the cap, WHICH docs
    // are stored) is then a function of the delivered set, not of task
    // interleaving
    rows.toSeq.sortBy(_.doc_id).foreach { r =>
      if (!stored.exists(_.doc_id == r.doc_id)) {
        stored.foreach { s =>
          val est = estJaccard(s.sig, r.sig)
          if (est >= threshold)
            out += CandPair(math.min(s.doc_id, r.doc_id),
              math.max(s.doc_id, r.doc_id), est)
        }
        if (stored.size < MaxPerBucket) stored = stored :+ StoredDoc(r.doc_id, r.sig)
      }
    }
    if (stored.nonEmpty) state.update(BucketState(stored))
    out.iterator
  }

  /** Candidate pairs from LSH-bucket state. Works identically over a batch
    * Dataset (state starts empty per group — one batch = the whole corpus)
    * and a streaming one (state persists across triggers). A pair sharing
    * several bands is emitted once per band; callers dedup on
    * (doc_a, doc_b) — `dropDuplicates` downstream in batch, the
    * first-arrival stateful dedup under streaming. */
  def candidates(rows: Dataset[BandRow], threshold: Double): Dataset[CandPair] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        update(threshold))
  }

  /** End-to-end batch form over (doc_id, text): one deterministic row per
    * candidate pair (max estimate across shared bands). */
  def nearDupPairs(docs: DataFrame, threshold: Double): DataFrame = {
    import docs.sparkSession.implicits._
    val rows = bandRows(docs).as[BandRow]
    candidates(rows, threshold)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(round(max(col("est_jaccard")), 4).as("est_jaccard"))
  }
}
