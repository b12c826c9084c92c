package graft.operators

import graft.{Det, GraftQuery, QueryGroup, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2-H: reshape (ops 50–52).
  *
  * SAS semantics covered: PROC TRANSPOSE long→wide and wide→long, ARRAY +
  * DO OVER column-set transforms.
  *
  * 100 TB notes: pivot with PINNED values (op 50) is one hash aggregation —
  * never call `.pivot(col)` without a value list at scale, since Spark then
  * runs a distinct scan over the full input just to discover the columns.
  * Unpivot (op 51) is a map-side Expand (rows × k, no shuffle). ARRAY/DO
  * OVER (op 52) via higher-order `transform` keeps one projection node
  * regardless of the column-set width, vs. k chained withColumns.
  */
object Reshape extends QueryGroup {

  /** op 50 — PROC TRANSPOSE long→wide: status × priority revenue matrix,
    * pivot values pinned for a stable schema, decimal-exact sums. */
  private val reshapePivotWide = GraftQuery(
    "reshape_pivot_wide",
    (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(Det.dsum(col("o_totalprice")))
        .withColumnRenamed("1-URGENT", "p_urgent")
        .withColumnRenamed("2-HIGH", "p_high")
        .withColumnRenamed("3-MEDIUM", "p_medium")
        .withColumnRenamed("4-NOT SPECIFIED", "p_unspecified")
        .withColumnRenamed("5-LOW", "p_low")
        .orderBy(col("o_orderstatus").asc_nulls_first),
    Some(s"""
      SELECT o_orderstatus,
             ${Det.sqlSum("CASE WHEN o_orderpriority='1-URGENT' THEN o_totalprice END")} AS p_urgent,
             ${Det.sqlSum("CASE WHEN o_orderpriority='2-HIGH' THEN o_totalprice END")} AS p_high,
             ${Det.sqlSum("CASE WHEN o_orderpriority='3-MEDIUM' THEN o_totalprice END")} AS p_medium,
             ${Det.sqlSum("CASE WHEN o_orderpriority='4-NOT SPECIFIED' THEN o_totalprice END")} AS p_unspecified,
             ${Det.sqlSum("CASE WHEN o_orderpriority='5-LOW' THEN o_totalprice END")} AS p_low
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus ASC NULLS FIRST"""))

  /** op 51 — PROC TRANSPOSE wide→long: melt per-status stats into
    * (stat, value) rows via Dataset.unpivot (map-side Expand). */
  private val reshapeUnpivotLong = GraftQuery(
    "reshape_unpivot_long",
    (s, dir) => {
      val wide = Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).cast(DoubleType).as("n_orders"),
          Det.dsum(col("o_totalprice")).as("sum_price"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
      wide.unpivot(
          ids = Array(col("o_orderstatus")),
          values = Array(col("n_orders"), col("sum_price"), col("min_price"), col("max_price")),
          variableColumnName = "stat",
          valueColumnName = "value")
        .orderBy(col("o_orderstatus").asc_nulls_first, col("stat").asc_nulls_first)
    },
    Some(s"""
      WITH wide AS (
        SELECT o_orderstatus,
               CAST(COUNT(*) AS DOUBLE) AS n_orders,
               ${Det.sqlSum("o_totalprice")} AS sum_price,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price
        FROM orders GROUP BY o_orderstatus)
      SELECT o_orderstatus, 'n_orders' AS stat, n_orders AS value FROM wide
      UNION ALL SELECT o_orderstatus, 'sum_price', sum_price FROM wide
      UNION ALL SELECT o_orderstatus, 'min_price', min_price FROM wide
      UNION ALL SELECT o_orderstatus, 'max_price', max_price FROM wide
      ORDER BY o_orderstatus ASC NULLS FIRST, stat ASC NULLS FIRST"""))

  /** op 52 — ARRAY x{*} + DO OVER: one transform across a column set via
    * array() + higher-order `transform`, plus element re-extraction. */
  private val arrayDoOver = GraftQuery(
    "array_do_over",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .withColumn("measures",
          array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")))
        .withColumn("scaled", transform(col("measures"), x => x * lit(100.0)))
        .withColumn("n_positive",
          aggregate(col("measures"), lit(0),
            (acc, x) => acc + when(x > 0.0, 1).otherwise(0)))
        // Driver compare cannot sort/hash array cells → project the array as a
        // canonical string. DECIMAL(18,4) capture before formatting so both
        // engines print the identical representation (see Det scaladoc).
        .withColumn("scaled",
          array_join(transform(col("scaled"), x => x.cast(graft.Det.Money).cast("string")), ","))
        .select(col("l_orderkey"), col("l_linenumber"), col("scaled"), col("n_positive"))
        .orderBy(col("l_orderkey").asc_nulls_first, col("l_linenumber").asc_nulls_first),
    Some("""
      SELECT l_orderkey, l_linenumber,
             array_to_string(list_transform([l_quantity, l_extendedprice, l_discount, l_tax],
                                            x -> CAST(CAST(x * 100.0 AS DECIMAL(18,4)) AS VARCHAR)), ',') AS scaled,
             CAST(list_sum(list_transform([l_quantity, l_extendedprice, l_discount, l_tax],
                                     x -> CASE WHEN x > 0.0 THEN 1 ELSE 0 END)) AS INTEGER) AS n_positive
      FROM lineitem
      ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST"""))

  override def queries: Seq[GraftQuery] = Seq(
    reshapePivotWide, reshapeUnpivotLong, arrayDoOver)
}
