package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B of the ADC scoring kernel (r13): the native `adc_dot` expression
  * vs the m-chained `element_at(typedlit)` composition it replaced —
  * timed as full-scan aggregates over a PQ codes table (no top-k, no
  * collect, no probe machinery), so the number is the per-row scoring
  * cost that scales with cell size at 100 TB, isolated from the
  * planning floor. The lookup table is synthetic-deterministic (cost
  * does not depend on table VALUES), and both forms must agree to the
  * last bit on the full-corpus sum — the 2 M-row parity complement to
  * AdcDotSpec's row-level pins.
  *
  * Usage: runMain graft.tools.AdcAb [codesPath] [k] [reps]
  *   default: /tmp/graft_annscale_pq_2000000_1024_m16_k64, 64, 3
  *   (built by AnnScaleProbe's IVFPQ phase). */
object AdcAb {
  def main(args: Array[String]): Unit = {
    val path = args.headOption
      .getOrElse("/tmp/graft_annscale_pq_2000000_1024_m16_k64")
    val k = if (args.length > 1) args(1).toInt else 64
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val codes = spark.read.parquet(path).select(col("codes"))
    val n = codes.count()
    val m = codes.select(size(col("codes"))).head.getInt(0)
    println(s"PROBE adc_ab path=$path n=$n m=$m k=$k")

    val flat = (0 until m * k).map(i => (i % 97).toDouble / 7.0)
    val tables = (0 until m).map(j => flat.slice(j * k, (j + 1) * k))
    val composition = tables.zipWithIndex.map { case (t, j) =>
      element_at(typedlit(t), element_at(col("codes"), j + 1).cast("int") + 1)
    }.reduce(_ + _)
    val native = call_function("adc_dot",
      col("codes"), typedlit(flat), lit(k))

    // parity fingerprint: bit_xor of per-row xxhash64 of the score — an
    // ORDER-INSENSITIVE exact multiset fingerprint. (A plain global
    // double sum is NOT a sound cross-plan check: partial sums merge in
    // shuffle-fetch arrival order, so two independently executed jobs
    // can legitimately differ in the last ulp even with bit-identical
    // per-row values — which is the property under test and the one
    // AdcDotSpec pins row-level.)
    def timedFp(c: org.apache.spark.sql.Column): (Long, Double) = {
      val t0 = System.nanoTime()
      val fp = codes.agg(bit_xor(xxhash64(c))).head.getLong(0)
      (fp, (System.nanoTime() - t0) / 1e9)
    }
    // warm both plans once (page cache + codegen), then alternate
    timedFp(composition); timedFp(native)
    val results = (1 to reps).map { r =>
      val (sOld, tOld) = timedFp(composition)
      val (sNew, tNew) = timedFp(native)
      require(sOld == sNew,
        s"parity violated at 2M rows: composition fp=$sOld native fp=$sNew")
      println(f"PROBE adc_ab rep=$r composition_s=$tOld%.3f native_s=$tNew%.3f " +
        f"composition_us_per_row=${tOld * 1e6 / n}%.3f " +
        f"native_us_per_row=${tNew * 1e6 / n}%.3f parity=ok")
      (tOld, tNew)
    }
    val (mo, mn) = (results.map(_._1).min, results.map(_._2).min)
    println(f"PROBE adc_ab best composition_s=$mo%.3f native_s=$mn%.3f " +
      f"speedup=${mo / mn}%.2fx")
    spark.stop()
  }
}
