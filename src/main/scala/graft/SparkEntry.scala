package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine itself lives in `graft.operators.*` (one `QueryGroup` per
  * SURVEY §2 category); this object only assembles the registry the driver
  * harness consumes.
  */
object SparkEntry {

  private def groups: Seq[QueryGroup] = Seq(
    operators.Sources,
    operators.RowOps,
    operators.Joins,
    operators.Aggregates,
    operators.Windows,
    operators.SortSetOps,
    operators.Reshape,
    operators.Scalars,
    operators.EtlComposites,
    operators.LlmOps,
    operators.Multimodal,
    operators.StreamingOps)

  lazy val all: Seq[GraftQuery] = {
    val qs = groups.flatMap(_.queries)
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs
  }

  /** Flagship (TPC-H Q3 shape — SURVEY §5 t1): customer⋈orders⋈lineitem,
    * revenue per order for one market segment, top 10. Exercises broadcast
    * of the filtered dimension, a shuffled fact join, decimal-exact
    * aggregation and TakeOrderedAndProject in one plan. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql.stripMargin.trim)).toMap
}
