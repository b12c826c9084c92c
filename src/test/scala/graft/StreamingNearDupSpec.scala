package graft

import graft.streaming.StreamingNearDup
import graft.streaming.StreamingNearDup.{BandRow, CandPair}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming LSH near-dup (StreamingNearDup): planted-mutant recovery in
  * batch form, batch/stream agreement across multi-batch delivery (the
  * mutant arriving BATCHES after its original), and the bounded-state cap
  * under an adversarial hot bucket. */
class StreamingNearDupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def plantedCorpus = {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val mutants = docs.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        regexp_replace(col("text"), "^\\w+ ", "graftmutant ").as("text"))
    docs.unionByName(mutants)
  }

  test("batch form recovers every planted mutant pair") {
    val pairs = SparkEntry.queries("stream_neardup_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = Tables.documents(spark, sf)
      .filter(col("doc_id") % 25 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(0) + 1000000L)).toSet
    assert(expected.nonEmpty)
    val missed = expected -- pairs
    assert(missed.isEmpty, s"planted pairs missed: $missed")
  }

  test("streaming delivery finds cross-batch pairs and agrees with batch") {
    val corpus = plantedCorpus
    // batch reference over the same corpus
    val want = StreamingNearDup.nearDupPairs(corpus, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // deliver originals and mutants in SEPARATE batches: every planted
    // pair must be found via bucket STATE, not within-batch comparison
    val rowsDf = StreamingNearDup.bandRows(corpus)
    val originals = rowsDf.filter(col("doc_id") < 1000000L).as[BandRow].collect().toSeq
    val mutants = rowsDf.filter(col("doc_id") >= 1000000L).as[BandRow].collect().toSeq

    val stream = MemoryStream[BandRow](spark)
    val q = StreamingNearDup.candidates(stream.toDS(), 0.5)
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      stream.addData(originals)
      q.processAllAvailable()
      stream.addData(mutants)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("neardup_out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"stream-batch diff: missing=${want -- got} extra=${got -- want}")
  }

  test("hot bucket is capped: state stores MaxPerBucket docs, pairs bounded") {
    val n = 100
    val cap = StreamingNearDup.MaxPerBucket
    // n identical texts with distinct ids: identical signatures put every
    // doc in the same bucket in every band — the adversarial hot bucket
    val hot = (0 until n).map(i =>
      (i.toLong, "the same exact text repeated for the hot bucket case")).toDF("doc_id", "text")
    val pairs = StreamingNearDup.nearDupPairs(hot, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // stored set = first `cap` arrivals; every later doc pairs only with
    // those: C(cap,2) + (n-cap)*cap distinct pairs, NOT C(n,2)
    val expected = cap * (cap - 1) / 2 + (n - cap) * cap
    assert(pairs.size == expected,
      s"got ${pairs.size} pairs, expected $expected (uncapped would be ${n * (n - 1) / 2})")
    // and every pair involves at least one stored (first-cap) doc
    assert(pairs.forall { case (a, b) => a < cap || b < cap })
  }
}
