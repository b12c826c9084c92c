package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DoubleType
import org.scalatest.funsuite.AnyFunSuite

/** FIXTURES.md micro-fixtures: nulls5 (SAS missing semantics, ops 15/44/55),
  * dup6 (deterministic NODUPKEY, ops 45/59), quantile9 (percentile
  * definition pin, gotcha G5). */
class MicroFixturesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val nulls5 = Seq[(Option[String], Option[Double])](
    (None, None), (Some("a"), None), (Some("a"), Some(1.0)),
    (Some("b"), Some(2.0)), (None, Some(3.0)))
    .toDF("k", "x")

  test("nulls5: null propagates through arithmetic, coalesce rescues") {
    val r = nulls5.select(
      (col("x") + 1.0).as("plus"),
      coalesce(col("x"), lit(0.0)).as("filled"))
      .collect()
    assert(r.count(_.isNullAt(0)) == 2)
    assert(r.map(_.getDouble(1)).sorted.toSeq == Seq(0.0, 0.0, 1.0, 2.0, 3.0))
  }

  test("nulls5: SAS missings sort FIRST under asc_nulls_first") {
    val ks = nulls5.orderBy(col("x").asc_nulls_first, col("k").asc_nulls_first)
      .select("x").collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(ks.take(2).forall(_ == null) && ks.drop(2).toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("nulls5: null-safe equality <=> vs plain =") {
    val r = nulls5.select(
      (col("x") <=> lit(null).cast(DoubleType)).as("nsafe"),
      (col("x") === lit(null).cast(DoubleType)).as("plain"))
      .collect()
    assert(r.count(_.getBoolean(0)) == 2)       // two null x rows match null-safely
    assert(r.forall(_.isNullAt(1)))             // plain = against null is never true
  }

  test("nulls5: SAS row-wise SUM skips missings, all-missing stays missing") {
    val a = col("x")
    val b = lit(null).cast(DoubleType)
    val sasSum = when(a.isNull && b.isNull, lit(null).cast(DoubleType))
      .otherwise(coalesce(a, lit(0.0)) + coalesce(b, lit(0.0)))
    val r = nulls5.select(sasSum.as("s")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(r.count(_ == null) == 2)
    assert(r.filter(_ != null).map(_.asInstanceOf[Double]).sorted.toSeq == Seq(1.0, 2.0, 3.0))
  }

  private lazy val dup6 = Seq(
    ("k1", 3L, "x3"), ("k1", 1L, "x1"), ("k1", 2L, "x2"),
    ("k2", 20L, "y20"), ("k2", 10L, "y10"), ("k2", 30L, "y30"))
    .toDF("k", "ts", "payload")

  test("dup6: window-based NODUPKEY keeps exactly the min-ts row, every run") {
    val w = Window.partitionBy(col("k")).orderBy(col("ts").asc)
    (1 to 5).foreach { _ =>
      val kept = dup6.repartition(4)  // shuffle the input layout
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("k", "payload").collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(kept == Set(("k1", "x1"), ("k2", "y10")))
    }
  }

  test("quantile9: Spark percentile is linear interpolation at p*(n-1) (G5)") {
    val vals = (1 to 9).map(_.toDouble).toDF("v")
    val r = vals.agg(
      expr("percentile(v, 0.25)").as("q25"),
      expr("percentile(v, 0.3)").as("q30"),
      expr("percentile(v, 0.5)").as("q50")).head()
    assert(r.getDouble(0) == 3.0)                    // 0.25*8=2 -> x[2]
    assert(math.abs(r.getDouble(1) - 3.4) < 1e-12)   // idx 2.4 -> 3 + 0.4
    assert(r.getDouble(2) == 5.0)
  }
}
