package graft.operators

import graft.{Det, GraftQuery, QueryGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2-D: aggregation (ops 27–36).
  *
  * SAS semantics covered: PROC MEANS/SUMMARY multi-statistic output, CLASS
  * `_TYPE_` subtotal combinations (= GROUPING SETS / ROLLUP / CUBE with
  * `grouping()` bits), PROC FREQ crosstabs, PROC UNIVARIATE quantiles.
  *
  * 100 TB notes, applying to every query here: these are all single-shuffle
  * hash aggregations with map-side partial aggregation (Spark plans
  * HashAggregate(partial) → Exchange(key) → HashAggregate(final)), the shape
  * that scales linearly with executors. Group-key cardinality here is tiny
  * (≤ thousands), so the final stage is never the bottleneck; for
  * billion-group keys you'd bump `spark.sql.shuffle.partitions` and let AQE
  * coalesce. Exact `countDistinct` rewrites to expand+two-phase agg (one
  * extra shuffle) — at 100 TB prefer `approx_count_distinct` (op 29).
  */
object Aggregates extends QueryGroup {

  import Det._

  /** op 27 — TPC-H Q1 shape: PROC MEANS n/sum/mean/std by CLASS over lineitem. */
  private val aggMultiStat = GraftQuery(
    "agg_multi_stat",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("2000-09-02 00:00:00").cast(TimestampNTZType))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("count_order"),
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          dstd(col("l_quantity")).as("std_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },
    Some(s"""
      SELECT l_returnflag, l_linestatus,
             COUNT(*) AS count_order,
             ${sqlSum("l_quantity")} AS sum_qty,
             ${sqlSum("l_extendedprice")} AS sum_base_price,
             ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
             ${sqlAvg("l_quantity")} AS avg_qty,
             ${sqlAvg("l_extendedprice")} AS avg_price,
             ${sqlAvg("l_discount")} AS avg_disc,
             ${sqlStd("l_quantity")} AS std_qty
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""))

  /** op 28 — exact COUNT(DISTINCT …): orders and parts per line status. */
  private val aggCountDistinct = GraftQuery(
    "agg_count_distinct",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_linestatus"))
        .agg(
          countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_linestatus").asc_nulls_first),
    Some("""
      SELECT l_linestatus,
             COUNT(DISTINCT l_orderkey) AS n_orders,
             COUNT(DISTINCT l_partkey) AS n_parts,
             COUNT(*) AS n_rows
      FROM lineitem
      GROUP BY l_linestatus
      ORDER BY l_linestatus ASC NULLS FIRST"""))

  /** op 29 — HLL approximate distinct (the 100 TB twin of op 28).
    * No oracle: HLL sketches differ across engines; correctness is asserted
    * in AggregatesSpec against the exact count within the configured rsd. */
  private val aggApproxDistinct = GraftQuery(
    "agg_approx_distinct",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
        .orderBy(col("event_type").asc_nulls_first),
    None)

  // Shared SQL for ops 30–32: identical text runs on Spark SQL and DuckDB —
  // `_type_` is composed from per-column GROUPING() bits (SAS `_TYPE_`
  // convention: 0 = grand total ... all-bits = most detailed) instead of
  // engine-specific GROUPING_ID() bit orders.
  private def subtotalSql(groupClause: String): String = s"""
      SELECT (1 - GROUPING(o_orderstatus)) * 2 + (1 - GROUPING(o_orderpriority)) AS _type_,
             o_orderstatus, o_orderpriority,
             COUNT(*) AS n,
             ${sqlSum("o_totalprice")} AS sum_price
      FROM orders
      GROUP BY $groupClause
      ORDER BY _type_ ASC, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""

  private def sqlOnView(name: String, sql: String): (SparkSession, String) => DataFrame =
    (s, dir) => {
      Tables(s, dir, name).createOrReplaceTempView(name)
      s.sql(sql)
    }

  /** op 30 — PROC SUMMARY TYPES: chosen subtotal combinations. */
  private val groupingSetsSql =
    subtotalSql("GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())")
  private val aggGroupingSets =
    GraftQuery("agg_grouping_sets", sqlOnView("orders", groupingSetsSql), Some(groupingSetsSql))

  /** op 31 — hierarchical subtotals (TYPES () a a*b). */
  private val rollupSql = subtotalSql("ROLLUP (o_orderstatus, o_orderpriority)")
  private val aggRollup =
    GraftQuery("agg_rollup", sqlOnView("orders", rollupSql), Some(rollupSql))

  /** op 32 — default CLASS behavior: all 2^n combinations (`_TYPE_`). */
  private val cubeSql = subtotalSql("CUBE (o_orderstatus, o_orderpriority)")
  private val aggCube =
    GraftQuery("agg_cube", sqlOnView("orders", cubeSql), Some(cubeSql))

  /** op 33 — GROUP BY … HAVING: big customers by order volume. */
  private val aggHaving = GraftQuery(
    "agg_having",
    (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_spend"))
        .where(col("total_spend") > lit(1500000.0))
        .orderBy(col("o_custkey").asc_nulls_first),
    Some(s"""
      SELECT o_custkey, COUNT(*) AS n_orders, ${sqlSum("o_totalprice")} AS total_spend
      FROM orders
      GROUP BY o_custkey
      HAVING ${sqlSum("o_totalprice")} > 1500000.0
      ORDER BY o_custkey ASC NULLS FIRST"""))

  /** op 34 — PROC FREQ TABLES a*b: two-way contingency counts (long form). */
  private val aggFreqCrosstab = GraftQuery(
    "agg_freq_crosstab",
    (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
    Some("""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      FROM orders
      GROUP BY o_orderstatus, o_orderpriority
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""))

  /** op 35 — PROC UNIVARIATE quantiles: exact `percentile` ≡ DuckDB
    * `quantile_cont` (both linear-interpolate at p·(n−1); pinned by
    * AggregatesSpec on the quantile9 micro-fixture, gotcha G5). Values are
    * rounded to 6dp on both sides: interpolation arithmetic is the one spot
    * where engines' expression shapes aren't forced identical.
    * 100 TB: switch to `percentile_approx` (single-pass sketch). */
  private val aggQuantiles = GraftQuery(
    "agg_quantiles",
    (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 6).as("p50"),
          round(expr("percentile(o_totalprice, 0.95)"), 6).as("p95"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy(col("o_orderstatus").asc_nulls_first),
    Some("""
      SELECT o_orderstatus,
             ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50,
             ROUND(quantile_cont(o_totalprice, 0.95), 6) AS p95,
             MIN(o_totalprice) AS lo,
             MAX(o_totalprice) AS hi
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus ASC NULLS FIRST"""))

  /** op 36 — values→array per group (SAS transpose idiom). Sorted distinct
    * set for determinism (bare collect_list order is partition-dependent).
    * Output projected through array_join: the driver compare (pandas
    * sort/hash) cannot handle array-typed cells; AggregatesSpec pins the
    * array form. */
  private val aggCollectList = GraftQuery(
    "agg_collect_list",
    (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(array_join(array_sort(collect_set(col("o_orderpriority"))), ",").as("priorities"))
        .orderBy(col("o_orderstatus").asc_nulls_first),
    Some("""
      SELECT o_orderstatus,
             array_to_string(list(o_orderpriority ORDER BY o_orderpriority ASC), ',') AS priorities
      FROM (SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders)
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus ASC NULLS FIRST"""))

  /** UDAF surface — typed Aggregator (SasStatsAggregator): PROC MEANS
    * n/nmiss/min/max/range with SAS missing semantics over a column made
    * nullable via NULLIF. */
  private val aggCustomAggregator = GraftQuery(
    "agg_custom_aggregator",
    (s, dir) => {
      import s.implicits._
      val stats = udaf(graft.functions.SasStatsAggregator.agg)
      Tables.lineitem(s, dir)
        .withColumn("d", nullif(col("l_discount"), lit(0.0)))
        .groupBy(col("l_linestatus"))
        .agg(stats(col("d")).as("s"))
        .select(col("l_linestatus"), col("s.n").as("n"), col("s.nmiss").as("nmiss"),
          col("s.min").as("min_d"), col("s.max").as("max_d"), col("s.range").as("range_d"))
        .orderBy(col("l_linestatus").asc_nulls_first)
    },
    Some("""
      SELECT l_linestatus,
             COUNT(d) AS n,
             COUNT(*) - COUNT(d) AS nmiss,
             MIN(d) AS min_d,
             MAX(d) AS max_d,
             MAX(d) - MIN(d) AS range_d
      FROM (SELECT l_linestatus, NULLIF(l_discount, 0.0) AS d FROM lineitem)
      GROUP BY l_linestatus
      ORDER BY l_linestatus ASC NULLS FIRST"""))

  /** op 35's 100 TB twin — single-pass sketch quantiles
    * (`approx_percentile`). No oracle (sketches are engine-specific);
    * AggregatesSpec bounds the approximation against the exact op. */
  private val aggQuantilesApprox = GraftQuery(
    "agg_quantiles_approx",
    (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(
          expr("approx_percentile(o_totalprice, 0.5, 10000)").as("p50_approx"),
          expr("approx_percentile(o_totalprice, 0.95, 10000)").as("p95_approx"))
        .orderBy(col("o_orderstatus").asc_nulls_first),
    None)

  /** PROC MEANS SKEW/KURT: SAS's bias-corrected sample skewness and
    * kurtosis, computed from EXACT integer power sums (l_quantity is
    * integral 1..50, so Σx..Σx⁴ fit in bigint exactly on both engines) and
    * one shared closed-form — the same SQL text runs on Spark and DuckDB,
    * so every double operation matches. Built-in skewness/kurtosis were
    * deliberately avoided: engines disagree on the correction terms. */
  private val skewKurtSql = """
      WITH sums AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(q) AS DOUBLE) AS s1,
               CAST(SUM(q*q) AS DOUBLE) AS s2,
               CAST(SUM(q*q*q) AS DOUBLE) AS s3,
               CAST(SUM(q*q*q*q) AS DOUBLE) AS s4
        FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q FROM lineitem)
        GROUP BY l_returnflag),
      d AS (SELECT l_returnflag, n, s1 / n AS m, s1, s2, s3, s4 FROM sums)
      SELECT l_returnflag,
             CAST(n AS BIGINT) AS n_obs,
             round((n / ((n-1) * (n-2))) * (s3 - 3*m*s2 + 2*n*m*m*m)
                   / pow(sqrt((s2 - s1*s1/n) / (n-1)), 3), 6) AS skew,
             round((n * (n+1) / ((n-1) * (n-2) * (n-3)))
                     * (s4 - 4*m*s3 + 6*m*m*s2 - 3*n*m*m*m*m)
                     / pow((s2 - s1*s1/n) / (n-1), 2)
                   - 3 * (n-1) * (n-1) / ((n-2) * (n-3)), 6) AS kurt
      FROM d
      ORDER BY l_returnflag ASC NULLS FIRST"""

  /** Spark side built independently via the DataFrame API (the oracle above
    * keeps the SQL text): same exact-integer power sums, same closed form —
    * the Column tree mirrors the SQL's parenthesisation operation-for-
    * operation, so every double op is the identical IEEE op and the hash
    * still matches bit-for-bit. */
  private def skewKurtDf(s: SparkSession, dir: String): DataFrame = {
    val q = col("l_quantity").cast(LongType)
    val sums = Tables.lineitem(s, dir)
      .select(col("l_returnflag"), q.as("q"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast(DoubleType).as("n"),
        sum(col("q")).cast(DoubleType).as("s1"),
        sum(col("q") * col("q")).cast(DoubleType).as("s2"),
        sum(col("q") * col("q") * col("q")).cast(DoubleType).as("s3"),
        sum(col("q") * col("q") * col("q") * col("q")).cast(DoubleType).as("s4"))
    val d = sums.withColumn("m", col("s1") / col("n"))
    val (n, m, s1, s2, s3, s4) =
      (col("n"), col("m"), col("s1"), col("s2"), col("s3"), col("s4"))
    d.select(
        col("l_returnflag"),
        n.cast(LongType).as("n_obs"),
        round((n / ((n - lit(1)) * (n - lit(2)))) * (s3 - lit(3) * m * s2 + lit(2) * n * m * m * m)
          / pow(sqrt((s2 - s1 * s1 / n) / (n - lit(1))), lit(3)), 6).as("skew"),
        round((n * (n + lit(1)) / ((n - lit(1)) * (n - lit(2)) * (n - lit(3))))
            * (s4 - lit(4) * m * s3 + lit(6) * m * m * s2 - lit(3) * n * m * m * m * m)
            / pow((s2 - s1 * s1 / n) / (n - lit(1)), lit(2))
          - lit(3) * (n - lit(1)) * (n - lit(1)) / ((n - lit(2)) * (n - lit(3))), 6).as("kurt"))
      .orderBy(col("l_returnflag").asc_nulls_first)
  }

  private val aggSkewKurt =
    GraftQuery("agg_skew_kurt", skewKurtDf, Some(skewKurtSql))

  /** PROC CORR: by-group Pearson correlation from EXACT cross-moment sums
    * in one shared closed form — the same SQL text runs on both engines,
    * so every double op matches bit-for-bit. Exactness strategy: Pearson
    * is scale-invariant, so price moves to integral cents (e2 = 100·price,
    * an exact double ≤ 1e7); every per-row product then stays under 2^53
    * (exact in double), and only the order-dependent SUMs are captured in
    * DECIMAL(38,4) — wide enough that Σe2² ≈ 1e20 cannot overflow (the
    * 18-digit capture used for plain money sums overflows on squared
    * terms). One aggregation pass computes all five sums (map-side
    * partial, single shuffle): the 100 TB shape for moment statistics. */
  private val corrSql = """
      WITH t AS (
        SELECT l_returnflag,
               CAST(l_quantity AS DOUBLE) AS q,
               round(l_extendedprice * 100.0) AS e2
        FROM lineitem),
      sums AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(q AS DECIMAL(38,4))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(e2 AS DECIMAL(38,4))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(q * q AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(e2 * e2 AS DECIMAL(38,4))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(q * e2 AS DECIMAL(38,4))) AS DOUBLE) AS sxy
        FROM t
        GROUP BY l_returnflag)
      SELECT l_returnflag,
             CAST(n AS BIGINT) AS n_obs,
             round((n * sxy - sx * sy)
                   / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_price
      FROM sums
      ORDER BY l_returnflag ASC NULLS FIRST"""

  /** Spark side via the DataFrame API (oracle keeps the SQL text): same
    * cents-scaling, same DECIMAL(38,4)-captured cross-moments, same closed
    * form with mirrored parenthesisation → bit-identical doubles. */
  private def corrDf(s: SparkSession, dir: String): DataFrame = {
    val Wide = DecimalType(38, 4)
    val t = Tables.lineitem(s, dir).select(
      col("l_returnflag"),
      col("l_quantity").cast(DoubleType).as("q"),
      round(col("l_extendedprice") * lit(100.0)).as("e2"))
    val sums = t.groupBy(col("l_returnflag")).agg(
      count(lit(1)).cast(DoubleType).as("n"),
      sum(col("q").cast(Wide)).cast(DoubleType).as("sx"),
      sum(col("e2").cast(Wide)).cast(DoubleType).as("sy"),
      sum((col("q") * col("q")).cast(Wide)).cast(DoubleType).as("sxx"),
      sum((col("e2") * col("e2")).cast(Wide)).cast(DoubleType).as("syy"),
      sum((col("q") * col("e2")).cast(Wide)).cast(DoubleType).as("sxy"))
    val (n, sx, sy, sxx, syy, sxy) =
      (col("n"), col("sx"), col("sy"), col("sxx"), col("syy"), col("sxy"))
    sums.select(
        col("l_returnflag"),
        n.cast(LongType).as("n_obs"),
        round((n * sxy - sx * sy)
          / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6).as("corr_qty_price"))
      .orderBy(col("l_returnflag").asc_nulls_first)
  }

  private val aggCorr =
    GraftQuery("agg_corr", corrDf, Some(corrSql))

  /** Hot-key aggregation via two-phase salting (etl.Salting): partials per
    * (key, salt-of-event_id), then merge — the 100 TB answer to a key that
    * owns a large fraction of the rows serializing its shuffle partition.
    * Decimal capture keeps the reassociated partial sums bit-exact, so the
    * oracle is the PLAIN single-phase GROUP BY: salting must be invisible
    * in the result. */
  private val aggSaltedSkew = GraftQuery(
    "agg_salted_skew",
    (s, dir) =>
      graft.etl.Salting.saltedSumCount(
          Tables.events(s, dir), col("event_type"), col("event_id"),
          saltFactor = 16, aggs = Map("sum_value" -> col("value").cast(Det.Money)))
        .select(col("_key").as("event_type"), col("n"),
          col("sum_value").cast("double").as("sum_value"))
        .orderBy(col("event_type").asc_nulls_first),
    Some(s"""
      SELECT event_type, COUNT(*) AS n, ${Det.sqlSum("value")} AS sum_value
      FROM events
      GROUP BY event_type
      ORDER BY event_type ASC NULLS FIRST"""))

  /** PROC STANDARD (STDIZE): per-group z-scores. Group stats via the
    * decimal-exact mean/stddev (Det), broadcast back onto the rows, one
    * identical closed form on both engines. Two passes over the fact but
    * only ONE shuffle (the stats agg) — the stats table is group-sized and
    * broadcast. */
  private val fnStandardize = GraftQuery(
    "fn_standardize",
    (s, dir) => {
      val stats = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(Det.davg(col("l_quantity")).as("m"), Det.dstd(col("l_quantity")).as("sd"))
      Tables.lineitem(s, dir)
        .join(broadcast(stats), "l_returnflag")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          round((col("l_quantity") - col("m")) / col("sd"), 6).as("z_qty"))
        .orderBy(col("l_orderkey").asc_nulls_first, col("l_linenumber").asc_nulls_first)
    },
    Some(s"""
      WITH stats AS (
        SELECT l_returnflag, ${Det.sqlAvg("l_quantity")} AS m, ${Det.sqlStd("l_quantity")} AS sd
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_orderkey, l_linenumber, l_returnflag,
             round((l_quantity - m) / sd, 6) AS z_qty
      FROM lineitem JOIN stats USING (l_returnflag)
      ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST"""))

  override def queries: Seq[GraftQuery] = Seq(
    aggMultiStat, aggCountDistinct, aggApproxDistinct, aggGroupingSets,
    aggRollup, aggCube, aggHaving, aggFreqCrosstab, aggQuantiles,
    aggQuantilesApprox, aggCollectList, aggCustomAggregator, aggSkewKurt,
    aggSaltedSkew, aggCorr, fnStandardize)
}
