package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** layouts.RangeBanded: the banded rewrite of a pure-range join must be
  * EXACTLY the brute-force join — including rows sitting precisely on
  * band boundaries (the case the candidate-band enumeration has to
  * cover), for windows NARROWER and WIDER than the band (the wide case
  * explodes each probe row to ⌈W/B⌉+1 bands — r9 verdict item 2), with
  * fan-out bounded by the window/band ratio and an absurd ratio refused
  * as a layout-choice error. */
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

  test("WIDE windows (W > band): rangeJoin ≡ brute force across band-boundary " +
      "rows, salted and unsalted, with window/band-ratio-bounded fan-out") {
    import spark.implicits._
    // banded rows sprinkled across 6 bands, with exact-boundary and ±1 µs
    // neighbors around every band edge a 2.5-band window can reach
    val bandedRows = (0L to 5L).flatMap { b =>
      Seq(b * W - 1, b * W, b * W + 1, b * W + W / 3, b * W + W - 1)
    }.filter(_ >= 0).distinct.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val probeRows = Seq(0L, 1L, W - 1, W, 2 * W - 1, 2 * W + 7L, 3 * W)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    def toDf(rows: Seq[(Long, Long)], idCol: String, tsCol: String) =
      rows.toDF(idCol, s"${tsCol}_us")
        .withColumn(tsCol, expr(s"timestamp_micros(${tsCol}_us)").cast("timestamp_ntz"))
        .drop(s"${tsCol}_us")
    val probe = toDf(probeRows, "p_id", "p_ts")
    // windows 2.5×, exactly 2×, and 3×+1µs the band width — each needs a
    // different candidate-band count (4, 3, 5)
    for ((win, wantFan) <- Seq((W * 5 / 2, 4), (2 * W, 3), (3 * W + 1, 5));
         salt <- Seq(1, 3)) {
      val banded = toDf(bandedRows, "b_id", "b_ts").withColumn("band",
        graft.layouts.RangeBanded.saltedBandOf("b_ts", W, salt, "b_id"))
      val got = graft.layouts.RangeBanded.rangeJoin(
          banded, probe, "b_ts", "p_ts", windowMicros = win, bandMicros = W,
          salt = salt)
        .select("b_id", "p_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (bi, bt) <- bandedRows
        (pi, pt) <- probeRows
        if bt >= pt && bt < pt + win
      } yield (bi, pi)).toSet
      assert(got == want, s"win=$win salt=$salt diverges from brute force: " +
        s"extra=${got -- want} missing=${want -- got}")
      // fan-out telemetry: bounded by the window/band ratio × salt,
      // never by the corpus
      assert(graft.layouts.RangeBanded.lastCandidateKeys == wantFan * salt,
        s"win=$win salt=$salt fan-out ${graft.layouts.RangeBanded.lastCandidateKeys}")
    }
  }

  test("autoSalt derives k from observed band occupancy: hot corpus → " +
      "⌈hot rows / target⌉, uniform corpus → 1, clamped at maxSalt; the " +
      "auto-salted join stays exact") {
    import spark.implicits._
    val edge = 2L * W
    // 160 rows in the hot band, 3 elsewhere — the 75 %-hot shape
    val hotRows = (0 until 160).map(i => (i.toLong, edge + (i * 7919L) % W)) ++
      Seq((900L, 1L), (901L, W + 5L), (902L, 3L * W + 12345L))
    def toDf(rows: Seq[(Long, Long)], idCol: String, tsCol: String) =
      rows.toDF(idCol, s"${tsCol}_us")
        .withColumn(tsCol, expr(s"timestamp_micros(${tsCol}_us)").cast("timestamp_ntz"))
        .drop(s"${tsCol}_us")
    val hot = toDf(hotRows, "b_id", "b_ts")
    // ⌈160/40⌉ = 4; the pick is also in the telemetry slot
    assert(graft.layouts.RangeBanded.autoSalt(hot, "b_ts", W,
      targetRowsPerTask = 40) == 4)
    assert(graft.layouts.RangeBanded.lastAutoSalt == 4)
    // clamp: a tiny target cannot explode the fan-out past maxSalt
    assert(graft.layouts.RangeBanded.autoSalt(hot, "b_ts", W,
      targetRowsPerTask = 1, maxSalt = 16) == 16)
    // a uniform corpus derives k = 1 — salting would be pure probe fan-out
    val uniform = toDf((0 until 96).map(i =>
      (i.toLong, (i % 48) * W + (i * 7919L) % W)), "b_id", "b_ts")
    assert(graft.layouts.RangeBanded.autoSalt(uniform, "b_ts", W,
      targetRowsPerTask = 40) == 1)
    // and the auto-derived salt joins EXACTLY like unsalted brute force
    val k = graft.layouts.RangeBanded.autoSalt(hot, "b_ts", W, targetRowsPerTask = 40)
    val banded = hot.withColumn("band",
      graft.layouts.RangeBanded.saltedBandOf("b_ts", W, k, "b_id"))
    val probe = toDf(Seq((0L, edge - 1), (1L, edge), (2L, edge + W / 2), (3L, 0L)),
      "p_id", "p_ts")
    val got = graft.layouts.RangeBanded.rangeJoin(
        banded, probe, "b_ts", "p_ts", windowMicros = W, bandMicros = W, salt = k)
      .select("b_id", "p_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (bi, bt) <- hotRows
      (pi, pt) <- Seq((0L, edge - 1), (1L, edge), (2L, edge + W / 2), (3L, 0L))
      if bt >= pt && bt < pt + W
    } yield (bi, pi)).toSet
    assert(got == want)
  }

  test("append folds a delta into the banded layout with the layout's own " +
      "salted key derivation: base + delta join ≡ brute force over the " +
      "union; a retried tag is a no-op") {
    import spark.implicits._
    val edge = 2L * W
    val baseRows = (0 until 60).map(i => (i.toLong, edge + (i * 7919L) % W)) ++
      Seq((900L, 1L), (901L, W + 5L))
    val deltaRows = (100 until 140).map(i => (i.toLong, edge + (i * 104729L) % W)) ++
      Seq((902L, 3L * W + 12345L), (903L, edge - 1), (904L, edge + W)) // boundary rows
    def toDf(rows: Seq[(Long, Long)]) =
      rows.toDF("b_id", "b_ts_us")
        .withColumn("b_ts", expr("timestamp_micros(b_ts_us)").cast("timestamp_ntz"))
        .drop("b_ts_us")
    val salt = 3
    graft.layouts.Bucketed.invalidate(spark, "rbappend_")
    // ensure needs a dir whose source tables exist for the cache sig;
    // the fixture content itself comes from the src DataFrame
    val t = graft.layouts.RangeBanded.ensure(spark, "/root/testdata/sf0.001",
      "rbappend_ev", toDf(baseRows), "b_ts", W, srcTables = Seq("events"),
      buckets = 4, salt = salt, saltCol = "b_id")
    assert(graft.layouts.RangeBanded.append(spark, t, toDf(deltaRows),
      "b_ts", W, salt = salt, saltCol = "b_id", tag = Some("day-1")))
    // retried batch: no-op, content unchanged
    val n = spark.table(t).count()
    assert(!graft.layouts.RangeBanded.append(spark, t, toDf(deltaRows),
      "b_ts", W, salt = salt, saltCol = "b_id", tag = Some("day-1")))
    assert(spark.table(t).count() == n && n == (baseRows ++ deltaRows).length)
    // the appended layout joins EXACTLY like brute force over the union —
    // a delta row banded/salted differently from ensure()'s derivation
    // would land in a bucket the probe never enumerates
    val probeRows = Seq((0L, edge - 1), (1L, edge), (2L, edge + W / 2),
      (3L, 3L * W), (4L, 0L))
    val probe = probeRows.toDF("p_id", "p_ts_us")
      .withColumn("p_ts", expr("timestamp_micros(p_ts_us)").cast("timestamp_ntz"))
      .drop("p_ts_us")
    val got = graft.layouts.RangeBanded.rangeJoin(
        spark.table(t), probe, "b_ts", "p_ts", windowMicros = W,
        bandMicros = W, salt = salt)
      .select("b_id", "p_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (bi, bt) <- baseRows ++ deltaRows
      (pi, pt) <- probeRows
      if bt >= pt && bt < pt + W
    } yield (bi, pi)).toSet
    assert(got == want,
      s"appended banded layout diverges: extra=${got -- want} missing=${want -- got}")
    // derivation-mismatch guard: a wrong band width / salt / salt column
    // would place delta rows in buckets the probe never enumerates —
    // refused against the layout name, not silently appended
    for ((bm, sl, sc) <- Seq((W / 2, salt, "b_id"), (W, salt + 1, "b_id"),
        (W, salt, "other_col"))) {
      val e = intercept[IllegalArgumentException] {
        graft.layouts.RangeBanded.append(spark, t, toDf(deltaRows),
          "b_ts", bm, salt = sl, saltCol = sc)
      }
      assert(e.getMessage.contains("does not match layout"), e.getMessage)
    }
  }

  test("rangeJoin refuses an absurd fan-out (window ~1000x the band = " +
      "layout-choice error, rebuild with wider bands)") {
    import spark.implicits._
    val df = Seq((1L, 0L)).toDF("id", "us")
      .withColumn("ts", expr("timestamp_micros(us)").cast("timestamp_ntz"))
    val banded = df.withColumn("band", graft.layouts.RangeBanded.bandOf("ts", W))
    val e = intercept[IllegalArgumentException] {
      graft.layouts.RangeBanded.rangeJoin(banded, df, "ts", "ts",
        windowMicros = 2000L * W, bandMicros = W)
    }
    assert(e.getMessage.contains("rebuild the layout with wider bands"))
    // Int-overflow hardening: a ratio past 2^31 must ALSO hit the guard —
    // a truncating Long→Int before the check would wrap past it and
    // silently drop matches (the failure mode the guard refuses)
    val e2 = intercept[IllegalArgumentException] {
      graft.layouts.RangeBanded.rangeJoin(banded, df, "ts", "ts",
        windowMicros = (1L << 40), bandMicros = 1L)
    }
    assert(e2.getMessage.contains("rebuild the layout with wider bands"), e2.getMessage)
  }
}
