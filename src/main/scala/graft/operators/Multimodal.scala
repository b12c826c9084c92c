package graft.operators

import graft.{GraftQuery, QueryGroup, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (NORTH-STAR): media as opaque `binary` columns with
  * typed metadata, plus a decode/feature-extract stage.
  *
  * No image/audio libraries exist in this container, so the DECODE step is
  * a clearly-marked deterministic stub (`MediaCodec.decodeStub`); everything
  * Spark-side — binary column handling, metadata struct schema, typed
  * Dataset + mapPartitions batch shape, partitioning — is real and tested
  * (MultimodalSpec).
  *
  * 100 TB notes: media payloads dominate bytes; keep them in their own
  * parquet column (columnar pruning skips them unless projected) and
  * partition by media type/date. The mapPartitions decode is the one
  * operator family where per-partition imperative code is justified
  * (SURVEY preference order (d)): codec calls are opaque to Catalyst.
  * Batch shape matters at scale: the iterator-in/iterator-out contract
  * below never materializes a partition in memory.
  */
object Multimodal extends QueryGroup {

  /** Typed row feeding the decode stage. */
  final case class MediaIn(doc_id: Long, mime: String, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Int,
      b_low: Int, b_mid: Int, b_high: Int, checksum: Long)

  /** The stubbed codec. A real deployment would decode image/audio/video
    * here (e.g. JNI codecs); the stub derives deterministic pseudo-features
    * from the raw bytes so tests can pin exact outputs. */
  object MediaCodec {
    def decodeStub(m: MediaIn): MediaFeatures = {
      val bytes = m.payload
      var low = 0; var mid = 0; var high = 0; var sum = 0L
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        if (b < 85) low += 1 else if (b < 170) mid += 1 else high += 1
        sum = sum * 31 + b
        i += 1
      }
      MediaFeatures(m.doc_id, m.mime, bytes.length, low, mid, high, sum)
    }
  }

  /** Deterministic mime assignment standing in for a real media catalog. */
  private def mimeOf = when(col("doc_id") % 3 === 0, "image/jpeg")
    .when(col("doc_id") % 3 === 1, "audio/wav")
    .otherwise("video/mp4")

  /** Binary payload + metadata struct assembly and projection; payload is
    * the UTF-8 bytes of the text (the "media" stand-in). Oracle checks the
    * byte lengths and mime routing. */
  private val mmBinaryMeta = GraftQuery(
    "mm_binary_meta",
    (s, dir) =>
      Tables.documents(s, dir)
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .withColumn("media", struct(
          mimeOf.as("mime"),
          length(col("payload")).as("n_bytes"),
          col("source").as("origin")))
        .select(
          col("doc_id"),
          col("media.mime").as("mime"),
          col("media.n_bytes").as("n_bytes"),
          col("media.origin").as("origin"))
        .orderBy(col("doc_id").asc_nulls_first),
    Some("""
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image/jpeg'
                  WHEN doc_id % 3 = 1 THEN 'audio/wav'
                  ELSE 'video/mp4' END AS mime,
             CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
             source AS origin
      FROM documents
      ORDER BY doc_id ASC NULLS FIRST"""))

  /** Decode/feature-extract over binary payloads via typed mapPartitions —
    * the real batch plumbing around the stubbed codec. Deterministic, so
    * exact outputs are pinned in MultimodalSpec; no SQL oracle (the codec
    * is not expressible in DuckDB). */
  private val mmDecodeFeatures = GraftQuery(
    "mm_decode_features",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .withColumn("mime", mimeOf)
        .select("doc_id", "mime", "payload")
        .as[MediaIn]
        .mapPartitions(_.map(MediaCodec.decodeStub))
        .toDF()
        .orderBy(col("doc_id").asc_nulls_first)
    },
    None)

  final case class Frame(doc_id: Long, frame_idx: Int, offset: Int, checksum: Long)

  /** Frame sampling: split each payload into fixed 64-byte "frames", keep
    * every 4th (the video frame-sample shape: decode is stubbed, the
    * multi-row-per-input batch plumbing — flatMap via mapPartitions — is
    * real). Deterministic; no SQL oracle (codec-side logic); pinned in
    * MultimodalSpec. */
  private val mmFrameSample = GraftQuery(
    "mm_frame_sample",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .withColumn("mime", mimeOf)
        .select("doc_id", "mime", "payload")
        .as[MediaIn]
        .mapPartitions(_.flatMap { m =>
          val frameSize = 64
          val stride = 4
          val nFrames = (m.payload.length + frameSize - 1) / frameSize
          (0 until nFrames by stride).iterator.map { i =>
            val off = i * frameSize
            val end = math.min(off + frameSize, m.payload.length)
            var sum = 0L
            var j = off
            while (j < end) { sum = sum * 31 + (m.payload(j) & 0xff); j += 1 }
            Frame(m.doc_id, i, off, sum)
          }
        })
        .toDF()
        .orderBy(col("doc_id").asc_nulls_first, col("frame_idx").asc_nulls_first)
    },
    None)

  final case class Resized(doc_id: Long, orig_bytes: Int, resized_bytes: Int,
      resized_checksum: Long)

  /** Resize stage (stubbed codec): deterministic 4:1 byte downsample of the
    * payload — a real resize would hand the bytes to an image library; the
    * binary-in/binary-out plumbing, sizes and checksums are what the
    * pipeline contracts on. */
  private val mmResize = GraftQuery(
    "mm_resize",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .withColumn("mime", mimeOf)
        .select("doc_id", "mime", "payload")
        .as[MediaIn]
        .mapPartitions(_.map { m =>
          val resized = Array.range(0, m.payload.length, 4).map(m.payload(_))
          var sum = 0L
          resized.foreach(b => sum = sum * 31 + (b & 0xff))
          Resized(m.doc_id, m.payload.length, resized.length, sum)
        })
        .toDF()
        .orderBy(col("doc_id").asc_nulls_first)
    },
    None)

  override def queries: Seq[GraftQuery] =
    Seq(mmBinaryMeta, mmDecodeFeatures, mmFrameSample, mmResize)
}
