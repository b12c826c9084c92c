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

  test("SALTED rangeJoin ≡ unsalted ≡ brute force, and a hot band's rows " +
      "spread across the salt keys") {
    import spark.implicits._
    // a HOT band: 200 rows in band 2 (the peak hour), a handful elsewhere
    val edge = 7200000000L
    val bandedRows =
      (0 until 200).map(i => (i.toLong, edge + (i * 7919L) % W)) ++ // hot band
        Seq((900L, 1L), (901L, W + 5L), (902L, 3L * W + 12345L))
    val probeRows = Seq(
      (0L, edge - 1), (1L, edge), (2L, edge + W / 2), (3L, 0L), (4L, 2L * W))
    def toDf(rows: Seq[(Long, Long)], idCol: String, tsCol: String) =
      rows.toDF(idCol, s"${tsCol}_us")
        .withColumn(tsCol, expr(s"timestamp_micros(${tsCol}_us)").cast("timestamp_ntz"))
        .drop(s"${tsCol}_us")
    val bandedRaw = toDf(bandedRows, "b_id", "b_ts")
    val probe = toDf(probeRows, "p_id", "p_ts")
    val want = (for {
      (bi, bt) <- bandedRows
      (pi, pt) <- probeRows
      if bt >= pt && bt < pt + W
    } yield (bi, pi)).toSet
    for (salt <- Seq(1, 4)) {
      val banded = bandedRaw.withColumn("band",
        graft.layouts.RangeBanded.saltedBandOf("b_ts", W, salt, "b_id"))
      val got = graft.layouts.RangeBanded.rangeJoin(
          banded, probe, "b_ts", "p_ts", windowMicros = W, bandMicros = W,
          salt = salt)
        .select("b_id", "p_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"salt=$salt diverges from brute force: " +
        s"extra=${got -- want} missing=${want -- got}")
      // the skew property: at salt=4 the hot band's 200 rows spread over
      // 4 distinct keys, none holding more than ~2/3 of the band
      val perKey = banded.groupBy(col("band")).count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      if (salt == 4) {
        val hotKeys = perKey.filter { case (k, _) => k / salt == 2L }
        assert(hotKeys.size == salt,
          s"hot band not split across all $salt salt keys: $hotKeys")
        assert(hotKeys.values.max < 134,
          s"salting left one key with most of the hot band: $hotKeys")
      } else assert(perKey(2L) == 200L, s"unsalted hot band distorted: $perKey")
    }
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
