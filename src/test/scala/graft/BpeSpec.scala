package graft

import graft.etl.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** etl.Bpe: the distributed BPE trainer against a complete JVM reference
  * implementation — merges learned, segmentations produced, and the
  * registry row's per-document counts must all match exactly (including
  * the deterministic (count desc, pair asc) tie-break).
  */
class BpeSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Pair tie-break ordering matching Spark's UTF-8 binary collation:
    * compare UTF-8 bytes unsigned, NOT Java's UTF-16 code units — the two
    * diverge for supplementary-plane characters, so a UTF-16 reference
    * would only match Spark on BMP/ASCII corpora. */
  private val utf8Ord: Ordering[String] = (x: String, y: String) =>
    java.util.Arrays.compareUnsigned(
      x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      y.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Reference greedy left-to-right merge, as in the Spark mergeStep. */
  private def mergeGreedy(syms: Seq[String], a: String, b: String): Seq[String] =
    syms.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
      else acc :+ x
    }

  /** Reference BPE trainer over a word-frequency map. */
  private def jvmTrain(wf: Map[String, Long], nMerges: Int)
      : (Seq[(String, String)], Map[String, Seq[String]]) = {
    var segs: Map[String, Seq[String]] = wf.keys.map(w => w -> w.split("").toSeq.filter(_.nonEmpty)).toMap
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    for (_ <- 1 to nMerges if !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((w, syms) <- segs; i <- 0 until syms.size - 1)
        counts((syms(i), syms(i + 1))) += wf(w)
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }(
            Ordering.Tuple3(Ordering.Long, utf8Ord, utf8Ord))
          .head._1
        merges += best
        segs = segs.map { case (w, s) => w -> mergeGreedy(s, best._1, best._2) }
      }
    }
    (merges.toSeq, segs)
  }

  test("trainer matches the JVM reference: merges, segmentations, per-doc counts") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), lower(trim(regexp_replace(col("text"), "\\s+", " "))).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val wf = docs.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }
    val (expMerges, expSegs) = jvmTrain(wf, 12)

    import spark.implicits._
    val wfDf = wf.toSeq.toDF("w", "cnt")
    val gotMerges = Bpe.train(wfDf, 12)
    assert(gotMerges == expMerges, s"merges diverge:\ngot  $gotMerges\nwant $expMerges")

    val gotSegs = Bpe.segment(wfDf.select("w"), gotMerges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    assert(gotSegs == expSegs)

    // registry row end-to-end: per-doc counts from the JVM segmentation
    val expected = docs.map { case (id, t) =>
      val ws = t.split(" ").toSeq
      id -> (ws.size.toLong, ws.map(_.length.toLong).sum, ws.map(w => expSegs(w).size.toLong).sum)
    }.toMap
    val got = SparkEntry.queries("llm_bpe_tokenize")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
    // the merges must actually compress: fewer BPE tokens than characters
    assert(got.values.forall { case (_, chars, toks) => toks < chars && toks > 0 })
  }

  test("size-driven strategies agree: driver-local == distributed delta on one table") {
    // r17: the small-table branch trains on a collected type table. The
    // JVM-reference assertions above would be near-tautological for it
    // (same algorithm shape), so pin the two SHIPPED strategies against
    // each other directly — the cut must be invisible in the merges.
    val docs = Tables.documents(spark, sf)
      .select(lower(trim(regexp_replace(col("text"), "\\s+", " "))).as("t"))
      .collect().map(_.getString(0))
    val wf = docs.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }
    import spark.implicits._
    val wfDf = wf.toSeq.toDF("w", "cnt")
    val local = Bpe.train(wfDf, 15)                      // under the default threshold
    val delta = Bpe.train(wfDf, 15, deltaThreshold = 0L) // forced distributed
    assert(local == delta, s"strategies diverge:\nlocal $local\ndelta $delta")
  }

  test("delta-updated path produces the identical merge list") {
    val docs = Tables.documents(spark, sf)
      .select(lower(trim(regexp_replace(col("text"), "\\s+", " "))).as("t"))
      .collect().map(_.getString(0))
    val wf = docs.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }
    val (expMerges, _) = jvmTrain(wf, 25)

    import spark.implicits._
    val wfDf = wf.toSeq.toDF("w", "cnt")
    // deltaThreshold = 0 forces the delta strategy on this small table;
    // the default picks full recount here, covered by the test above
    val gotDelta = Bpe.train(wfDf, 25, deltaThreshold = 0L)
    assert(gotDelta == expMerges,
      s"delta path diverges:\ngot  $gotDelta\nwant $expMerges")
  }
}
