package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{Frame, MediaCodec, MediaFeatures, MediaIn, Resized, StubCodec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal decode stub is deterministic — pin its exact outputs and
  * the Spark-side batch plumbing (typed mapPartitions over binary) — and
  * the codec SEAM is real: a user-supplied MediaCodec flows through the
  * same decodeFeatures/frameSample/resizeMedia plumbing unchanged. */
class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  test("StubCodec.decode: exact features for known bytes") {
    val f = StubCodec.decode(MediaIn(7L, "image/jpeg", "ab".getBytes("UTF-8")))
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
    val local = StubCodec.decode(MediaIn(0L, mime0, doc0.getBytes("UTF-8")))
    assert(r0.getLong(0) == 0L && r0.getString(1) == mime0)
    assert(r0.getInt(2) == local.n_bytes)
    assert((r0.getInt(3), r0.getInt(4), r0.getInt(5)) == ((local.b_low, local.b_mid, local.b_high)))
    assert(r0.getLong(6) == local.checksum)
  }

  /** A second codec standing in for a user's real decoder: features from
    * payload HALVES, one frame per 100 bytes, 2:1 resize — nothing shared
    * with the stub's rules. */
  private object TestCodec extends MediaCodec {
    def decode(m: MediaIn): MediaFeatures =
      MediaFeatures(m.doc_id, m.mime, m.payload.length,
        m.payload.length / 2, m.payload.length - m.payload.length / 2, 0,
        m.payload.foldLeft(7L)((a, b) => a * 131 + (b & 0xff)))
    def frames(m: MediaIn): Iterator[Frame] =
      (0 until m.payload.length by 100).iterator.zipWithIndex.map {
        case (off, i) => Frame(m.doc_id, i, off, (m.payload(off) & 0xff).toLong)
      }
    def resize(m: MediaIn): Resized =
      Resized(m.doc_id, m.payload.length, (m.payload.length + 1) / 2,
        m.payload.length.toLong)
  }

  test("codec seam: a user-supplied MediaCodec flows through the same " +
      "plumbing — distributed output = per-row local application") {
    val media = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("mime", lit("video/mp4"))
    val localIn = media.select("doc_id", "mime", "payload").collect()
      .map(r => MediaIn(r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2)))
    assert(localIn.nonEmpty)

    val dec = Multimodal.decodeFeatures(media, TestCodec).collect()
      .map(r => (r.getLong(0), (r.getInt(2), r.getInt(3), r.getInt(4),
        r.getInt(5), r.getLong(6)))).toMap
    localIn.foreach { m =>
      val e = TestCodec.decode(m)
      assert(dec(m.doc_id) ==
        ((e.n_bytes, e.b_low, e.b_mid, e.b_high, e.checksum)), s"doc ${m.doc_id}")
    }

    val fr = Multimodal.frameSample(media, TestCodec).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .groupBy(_._1)
    localIn.foreach { m =>
      val e = TestCodec.frames(m).map(f => (f.doc_id, f.frame_idx, f.offset, f.checksum)).toSeq
      assert(fr.getOrElse(m.doc_id, Array.empty).sortBy(_._2).toSeq == e, s"doc ${m.doc_id}")
    }

    val rs = Multimodal.resizeMedia(media, TestCodec).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    localIn.foreach { m =>
      val e = TestCodec.resize(m)
      assert(rs(m.doc_id) ==
        ((e.orig_bytes, e.resized_bytes, e.resized_checksum)), s"doc ${m.doc_id}")
    }
  }
}
