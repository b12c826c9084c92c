package graft

import graft.operators.Multimodal.{MediaCodec, MediaIn}
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal decode stub is deterministic — pin its exact outputs and
  * the Spark-side batch plumbing (typed mapPartitions over binary). */
class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  test("decodeStub: exact features for known bytes") {
    val f = MediaCodec.decodeStub(MediaIn(7L, "image/jpeg", "ab".getBytes("UTF-8")))
    assert(f.doc_id == 7L && f.mime == "image/jpeg")
    assert(f.n_bytes == 2)
    assert((f.b_low, f.b_mid, f.b_high) == ((0, 2, 0)))  // 'a'=97, 'b'=98 both in [85,170)
    assert(f.checksum == 97L * 31 + 98)
  }

  test("mm_frame_sample: every 4th 64-byte frame, offsets and counts exact") {
    val rows = SparkEntry.queries("mm_frame_sample")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getLong(0))
    val docLens = Tables.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("doc_id", "octet_length(text) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    byDoc.foreach { case (id, frames) =>
      val nFrames = (docLens(id) + 63) / 64
      val expected = (0 until nFrames by 4)
      assert(frames.map(_.getInt(1)).sorted.toSeq == expected)
      frames.foreach(f => assert(f.getInt(2) == f.getInt(1) * 64))
    }
  }

  test("mm_decode_features: distributed decode matches local stub") {
    val rows = SparkEntry.queries("mm_decode_features")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 500)
    val r0 = rows.head
    // recompute the first doc locally through the same codec
    val doc0 = Tables.documents(spark, "/root/testdata/sf0.001")
      .orderBy("doc_id").select("text").head().getString(0)
    val mime0 = "image/jpeg"  // doc_id 0 % 3 == 0
    val local = MediaCodec.decodeStub(MediaIn(0L, mime0, doc0.getBytes("UTF-8")))
    assert(r0.getLong(0) == 0L && r0.getString(1) == mime0)
    assert(r0.getInt(2) == local.n_bytes)
    assert((r0.getInt(3), r0.getInt(4), r0.getInt(5)) == ((local.b_low, local.b_mid, local.b_high)))
    assert(r0.getLong(6) == local.checksum)
  }
}
