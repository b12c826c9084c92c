package graft

import graft.etl.Scd
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType
import org.scalatest.funsuite.AnyFunSuite

/** FIXTURES.md scd_master/scd_delta micro-fixture: one changed key, one new
  * key, unchanged keys (including a delta row with identical attributes —
  * must be a no-op). */
class ScdSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("scd2Load: close changed, insert new, no-op identical delta") {
    val master = Seq(
      (1L, 100.0, "A"), (2L, 200.0, "B"), (3L, 300.0, "C"), (4L, 400.0, "D"))
      .toDF("bk", "bal", "seg")
      .withColumn("valid_from", lit("2020-01-01").cast(DateType))
      .withColumn("valid_to", lit(null).cast(DateType))
      .withColumn("is_current", lit(1))
    val delta = Seq(
      (2L, 250.0, "B"),   // changed
      (3L, 300.0, "C"),   // identical -> no-op
      (5L, 500.0, "E"))   // new key
      .toDF("bk", "bal", "seg")

    val out = Scd.scd2Load(master, delta, Seq("bal", "seg"), "2024-06-01")
      .orderBy("bk", "valid_from").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
        r.getDate(3), Option(r.getDate(4)), r.getInt(5)))

    assert(out.toSeq == Seq(
      (1L, 100.0, "A", d("2020-01-01"), None, 1),
      (2L, 200.0, "B", d("2020-01-01"), Some(d("2024-06-01")), 0),  // closed
      (2L, 250.0, "B", d("2024-06-01"), None, 1),                   // new version
      (3L, 300.0, "C", d("2020-01-01"), None, 1),                   // no-op
      (4L, 400.0, "D", d("2020-01-01"), None, 1),
      (5L, 500.0, "E", d("2024-06-01"), None, 1)))                  // inserted
  }

  test("scd2Load: repeated loads leave closed history untouched") {
    val master = Seq((1L, 100.0, "A"), (2L, 200.0, "B")).toDF("bk", "bal", "seg")
      .withColumn("valid_from", lit("2020-01-01").cast(DateType))
      .withColumn("valid_to", lit(null).cast(DateType))
      .withColumn("is_current", lit(1))

    val load1 = Scd.scd2Load(master, Seq((2L, 250.0, "B")).toDF("bk", "bal", "seg"),
      Seq("bal", "seg"), "2024-06-01")
    // Second load changes key 2 again: the 2020 history row must NOT be
    // re-closed or re-versioned (the pre-fix full-master join did both).
    val load2 = Scd.scd2Load(load1, Seq((2L, 275.0, "B")).toDF("bk", "bal", "seg"),
      Seq("bal", "seg"), "2024-09-01")
      .orderBy("bk", "valid_from").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDate(3), Option(r.getDate(4)), r.getInt(5)))

    assert(load2.toSeq == Seq(
      (1L, 100.0, d("2020-01-01"), None, 1),
      (2L, 200.0, d("2020-01-01"), Some(d("2024-06-01")), 0),  // history verbatim
      (2L, 250.0, d("2024-06-01"), Some(d("2024-09-01")), 0),  // closed this load
      (2L, 275.0, d("2024-09-01"), None, 1)))                  // new current
  }

  test("scd2Load: null-safe attribute compare (null -> value counts as change)") {
    val master = Seq((1L, Option.empty[Double], "A")).toDF("bk", "bal", "seg")
      .withColumn("valid_from", lit("2020-01-01").cast(DateType))
      .withColumn("valid_to", lit(null).cast(DateType))
      .withColumn("is_current", lit(1))
    val delta = Seq((1L, Option(9.0), "A")).toDF("bk", "bal", "seg")
    val out = Scd.scd2Load(master, delta, Seq("bal", "seg"), "2024-06-01")
    assert(out.count() == 2)  // closed + new version, not a silent no-op
    assert(out.filter(col("is_current") === 1).select("bal").head().getDouble(0) == 9.0)
  }
}
