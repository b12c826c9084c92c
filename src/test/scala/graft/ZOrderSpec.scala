package graft

import graft.layouts.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** layouts.ZOrder: the multi-dimensional clustering claim, MEASURED. The
  * oracle row (scan_zorder_box) already proves the layout is a pure
  * reordering; these tests pin (a) the Morton math, and (b) that the
  * 2-D box actually prunes: the z-ordered files surface far fewer rows
  * from the scan than the same data sorted by an uncorrelated key.
  */
class ZOrderSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("zval: bit interleave matches a JVM recompute; ordering clusters boxes") {
    import spark.implicits._
    def jvmZ(x: Long, y: Long): Long =
      (0 until 31).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (7L, 5L), (1000000007L, 99L), (12345L, 54321L))
    val got = pairs.toDF("x", "y").select(ZOrder.zval(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == pairs.map { case (x, y) => jvmZ(x, y) })
  }

  test("z-layout prunes a 2-D box that a single-key sort cannot") {
    // AQE wraps stages in QueryStageExec nodes plan.collect cannot descend
    // through (the DppSpec lesson) — metrics need it off
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val dir = "/root/testdata/sf0.01" // 60k rows -> ~32 files per layout
    val li = Tables.lineitem(s, dir)
    val zPath = ZOrder.ensure(s, dir, "lineitem_zspec", li, "lineitem", "l_partkey", "l_suppkey")
    // control: identical write pipeline, sorted by a key uncorrelated with the box
    val nPath = "/tmp/graft_zorder_control_spec"
    if (!new java.io.File(s"$nPath/_SUCCESS").exists) {
      li.repartitionByRange(4, col("l_orderkey")).sortWithinPartitions("l_orderkey")
        .write.mode("overwrite").option("maxRecordsPerFile", 2000L).parquet(nPath)
    }
    // the registry row's derived mid-span box, recomputed here
    val b = li.agg(min(col("l_partkey")), max(col("l_partkey")),
      min(col("l_suppkey")), max(col("l_suppkey"))).collect().head
    val (pmin, pmax, smin, smax) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val pl = pmin + (pmax - pmin) / 2; val ph = pl + (pmax - pmin) / 10
    val sl = smin + (smax - smin) / 2; val sh = sl + (smax - smin) / 5
    def boxed(path: String) = s.read.parquet(path)
      .filter(col("l_partkey").between(pl, ph) && col("l_suppkey").between(sl, sh))
    def scannedRows(path: String): Long = {
      val df = boxed(path).groupBy(col("l_returnflag")).agg(count(lit(1)))
      df.collect()
      // vectorized parquet: the scan's own numOutputRows stays 0; rows are
      // counted where batches become rows, at ColumnarToRowExec (directly
      // above the scan, below the filter) — that value is "rows surviving
      // row-group pruning", exactly the layout signal
      val conv = df.queryExecution.executedPlan.collectFirst {
        case c: org.apache.spark.sql.execution.ColumnarToRowExec => c
      }
      assert(conv.nonEmpty, "no columnar->row conversion in plan")
      conv.get.metrics("numOutputRows").value
    }
    val zRows = scannedRows(zPath)
    val nRows = scannedRows(nPath)
    assert(zRows < nRows / 3,
      s"z-layout scan surfaced $zRows rows vs control $nRows — no pruning win")
    // and the z result is still the full, correct box (pure reordering)
    assert(boxed(zPath).count() == li.filter(
      col("l_partkey").between(pl, ph) && col("l_suppkey").between(sl, sh)).count())
  }
}
