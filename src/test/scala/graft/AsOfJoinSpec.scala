package graft

import graft.plans.AsOf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** The custom AsOfJoinExec operator: exact semantics on a hand-computed
  * fixture, equivalence with the union+window formulation on real data,
  * and presence of the custom exec node in the physical plan. */
class AsOfJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("hand-computed fixture: latest prior row per key, nulls when none") {
    val trades = Seq(
      (1L, 10L, t("2024-01-01 10:00:05")),
      (2L, 10L, t("2024-01-01 10:00:20")),
      (3L, 20L, t("2024-01-01 10:00:10")),
      (4L, 30L, t("2024-01-01 10:00:10")))
      .toDF("trade_id", "k", "ts")
    val quotes = Seq(
      (10L, t("2024-01-01 10:00:00"), 1.0),
      (10L, t("2024-01-01 10:00:05"), 2.0),   // same instant as trade 1 -> matches (<=)
      (10L, t("2024-01-01 10:00:15"), 3.0),
      (20L, t("2024-01-01 10:00:11"), 9.0))   // after trade 3 -> no match
      .toDF("qk", "qts", "price")
    val out = AsOf.join(trades, quotes, "k", "qk", "ts", "qts")
      .select("trade_id", "price").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out == Map(1L -> 2.0, 2L -> 3.0, 3L -> null, 4L -> null))
  }

  test("null left key/ts gets null right columns, not a key-0/epoch-0 match") {
    val trades = Seq(
      (1L, Option(10L), Option(t("2024-01-01 10:00:05"))),
      (2L, Option(0L), Option(t("2024-01-01 10:00:05"))),   // real key 0 -> matches
      (3L, Option.empty[Long], Option(t("2024-01-01 10:00:05"))),  // null key
      (4L, Option(10L), Option.empty[Timestamp]))                   // null ts
      .toDF("trade_id", "k", "ts")
    val quotes = Seq(
      (0L, t("2024-01-01 10:00:00"), 7.0),    // key 0: a null left key must NOT hit this
      (10L, t("2024-01-01 10:00:00"), 1.0))
      .toDF("qk", "qts", "price")
    val out = AsOf.join(trades, quotes, "k", "qk", "ts", "qts")
      .select("trade_id", "price").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out == Map(1L -> 1.0, 2L -> 7.0, 3L -> null, 4L -> null))
  }

  test("physical plan uses the custom AsOfJoinExec") {
    val df = SparkEntry.queries("join_asof_native")(spark, "/root/testdata/sf0.001")
    // the exec node prints without its "Exec" suffix
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
  }

  test("AQE coalescing stress: correct when shuffle partitions coalesce around the node") {
    // force aggressive partition coalescing: many small shuffle partitions
    // (prime count, skewed sides) + a large advisory target, AQE on
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m",
      "spark.sql.shuffle.partitions" -> "37")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // skewed: 10k trades over 53 keys, sparse quotes — sides coalesce differently
      val trades = spark.range(10000).selectExpr(
        "id AS trade_id", "id % 53 AS k",
        "timestamp_micros(CAST(1700000000000000 + id * 1000000 AS BIGINT)) AS ts")
      val quotes = spark.range(2000).selectExpr(
        "id % 53 AS qk",
        "timestamp_micros(CAST(1700000000000000 + id * 4700000 AS BIGINT)) AS qts",
        "CAST(id AS DOUBLE) AS price")
      val native = AsOf.join(trades, quotes, "k", "qk", "ts", "qts")
        .select("trade_id", "price").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)))).sortBy(_._1)
      assert(native.length == 10000)
      // reference: window formulation (union + last carry-forward)
      // quote-before-trade at equal ts mirrors the native <= match
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("k")).orderBy(col("ts").asc, col("is_quote").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val unioned = trades.select(col("trade_id"), col("k"), col("ts"),
          lit(0).as("is_quote"), lit(null).cast("double").as("price"))
        .unionByName(quotes.select(lit(null).cast("long").as("trade_id"),
          col("qk").as("k"), col("qts").as("ts"), lit(1).as("is_quote"), col("price")))
      val ref = unioned
        .withColumn("p", last(when(col("is_quote") === 1, col("price")), ignoreNulls = true).over(w))
        .filter(col("is_quote") === 0)
        .select("trade_id", "p").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)))).sortBy(_._1)
      assert(native.toSeq == ref.toSeq)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("native operator == union+window formulation on real events") {
    val dir = "/root/testdata/sf0.001"
    val native = SparkEntry.queries("join_asof_native")(spark, dir).collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.toString)))
    val window = SparkEntry.queries("join_asof")(spark, dir).collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.toString)))
    assert(native.nonEmpty && native.toSeq == window.toSeq)
  }
}
