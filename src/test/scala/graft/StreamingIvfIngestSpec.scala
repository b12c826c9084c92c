package graft

import graft.etl.Ivf
import graft.functions.VectorOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming IVF index maintenance (layouts.IvfIndex.appendStream): a
  * vector stream is assigned map-side against a frozen quantizer and
  * appended into the cent_id-partitioned layout; the growing index stays
  * probe-prunable and the streamed assignment is bit-identical to the
  * batch one. */
class StreamingIvfIngestSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  case class Vec(vec_id: Long, v: Seq[Double])

  private val sf = "/root/testdata/sf0.001"

  test("stream-appended index: partitioned dirs, batch-identical assignment, prunable reads") {
    val base = Tables.embeddings(spark, sf)
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
    val cents = Ivf.train(base, k = 8, iters = 2)
    val batchAssigned = Ivf.assign(base, cents)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    val idx = "/tmp/graft_ivf_stream_idx"
    val cp = "/tmp/graft_ivf_stream_cp"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idx))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(cp))

    val rows = base.collect().map(r => Vec(r.getLong(0), r.getSeq[Double](1)))
    val stream = MemoryStream[Vec](spark)
    val q = graft.layouts.IvfIndex.appendStream(stream.toDF(), cents, idx, cp)
    try {
      // two micro-batches: the index must accumulate across triggers
      stream.addData(rows.take(rows.length / 2))
      q.processAllAvailable()
      stream.addData(rows.drop(rows.length / 2))
      q.processAllAvailable()
    } finally q.stop()

    // partition directories exist and carry every centroid seen in batch
    val dirs = new java.io.File(idx).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cent_id=")).map(_.getName).toSet
    val wantCents = batchAssigned.values.toSet.map((c: Long) => s"cent_id=$c")
    assert(dirs == wantCents, s"dirs=$dirs want=$wantCents")

    // streamed assignment == batch assignment, row for row
    // partition-dir inference types cent_id as int; cast back to the model's long
    val streamed = spark.read.parquet(idx)
      .select(col("vec_id"), col("cent_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed == batchAssigned)

    // probe-style read prunes: one centroid's filter reads only that dir
    val oneCent = batchAssigned.values.head
    val probe = spark.read.parquet(idx).filter(col("cent_id") === oneCent)
    val scan = probe.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.nonEmpty)
    probe.collect()
    val readParts = scan.get.metrics("numPartitions").value
    assert(readParts == 1, s"probe read $readParts partitions, expected 1")

    // compaction: two micro-batches left >1 file in dirs touched twice;
    // the compacted root has exactly one file per partition, same rows
    def files(root: String) = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cent_id="))
      .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    val before = files(idx)
    assert(before.values.exists(_ > 1), s"no multi-file partition to compact: $before")
    val compacted = "/tmp/graft_ivf_stream_idx_c"
    graft.layouts.IvfIndex.compact(spark, idx, compacted)
    val after = files(compacted)
    assert(after.keySet == before.keySet)
    assert(after.values.forall(_ == 1), s"compaction left multi-file dirs: $after")
    val rowsAfter = spark.read.parquet(compacted)
      .select(col("vec_id"), col("cent_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rowsAfter == batchAssigned)
  }
}
