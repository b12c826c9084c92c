package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** layouts.RangeBanded: the banded rewrite of a pure-range join must be
  * EXACTLY the brute-force join — including rows sitting precisely on
  * band boundaries (the case the two-candidate-band argument has to
  * cover) — and must refuse a window wider than the band. */
class RangeBandedSpec extends AnyFunSuite with SparkTestBase {

  private val W = 3600000000L // 1h in µs

  test("rangeJoin ≡ brute-force range join, boundary rows included") {
    import spark.implicits._
    // timestamps engineered around band edges: exact multiples of the
    // band width, ±1 µs neighbors, and window-width-minus-one spans
    val edge = 7200000000L // band boundary at 2h
    val bandedTimes = Seq(
      edge - 1, edge, edge + 1,                     // straddle a boundary
      edge + W - 1, edge + W, edge + W + 1,         // next boundary
      1L, W - 1, W, 3L * W + 12345L)
    val probeTimes = Seq(
      edge - 1, edge, edge - W, edge - W + 1,       // windows ending at/around edge
      edge + 1, W - 1, 2L * W, 0L)
    def toDf(ts: Seq[Long], idCol: String, tsCol: String) =
      ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF(idCol, s"${tsCol}_us")
        .withColumn(tsCol, expr(s"timestamp_micros(${tsCol}_us)").cast("timestamp_ntz"))
        .drop(s"${tsCol}_us")
    val bandedRaw = toDf(bandedTimes, "b_id", "b_ts")
    val probe = toDf(probeTimes, "p_id", "p_ts")
    val banded = bandedRaw.withColumn("band",
      graft.layouts.RangeBanded.bandOf("b_ts", W))
    val got = graft.layouts.RangeBanded.rangeJoin(
        banded, probe, "b_ts", "p_ts", windowMicros = W, bandMicros = W)
      .select("b_id", "p_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (bt, bi) <- bandedTimes.zipWithIndex
      (pt, pi) <- probeTimes.zipWithIndex
      if bt >= pt && bt < pt + W
    } yield (bi.toLong, pi.toLong)).toSet
    assert(got == want,
      s"banded join diverges from brute force: extra=${got -- want} missing=${want -- got}")
  }

  test("rangeJoin refuses a window wider than the band (silent misses)") {
    import spark.implicits._
    val df = Seq((1L, 0L)).toDF("id", "us")
      .withColumn("ts", expr("timestamp_micros(us)").cast("timestamp_ntz"))
    val banded = df.withColumn("band", graft.layouts.RangeBanded.bandOf("ts", W))
    val e = intercept[IllegalArgumentException] {
      graft.layouts.RangeBanded.rangeJoin(banded, df, "ts", "ts",
        windowMicros = W + 1, bandMicros = W)
    }
    assert(e.getMessage.contains("exceeds band width"))
  }
}
