package graft.operators

import graft.{Det, GraftQuery, QueryGroup, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** SURVEY.md §2-J: ETL composites (ops 58–62) — the reference's actual job
  * patterns: SCD2 dimension maintenance, incremental append+dedup, validate/
  * split row routing, CDC row hashing, surrogate key assignment.
  *
  * Master/delta inputs are derived deterministically from the testdata
  * (delta = every 10th/7th business key, mutated) so the oracle can state
  * the expected outcome in closed form while the Spark side runs the real
  * general-purpose algorithm (join-based merge, not the closed form).
  *
  * 100 TB notes: SCD2 here is the join formulation of Delta-style MERGE
  * INTO — one shuffle join master⋈delta on the business key; master stays
  * partitioned by key so repeated loads co-locate. Incremental dedup
  * shuffles once on the key. Validate/split computes rules in ONE pass and
  * routes by tag — never run the input twice with complementary filters at
  * scale (the driver harness consumes one DataFrame, so the routed union
  * carries a status tag; callers would `.filter` each side off a cached df).
  */
object EtlComposites extends QueryGroup {

  private val eff = "2024-01-01"

  /** op 58 — SCD Type-2 load: close changed rows, version them, insert new
    * keys. Real full-outer-join merge on the Spark side. */
  private val etlScd2Load = GraftQuery(
    "etl_scd2_load",
    (s, dir) => {
      val master = Tables.customer(s, dir)
        .select(col("c_custkey").as("bk"), col("c_acctbal").as("acctbal"),
          col("c_mktsegment").as("segment"),
          lit("2020-01-01").cast(DateType).as("valid_from"),
          lit(null).cast(DateType).as("valid_to"),
          lit(1).as("is_current"))
      val delta = Tables.customer(s, dir).filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey").as("bk"), (col("c_acctbal") + 100.0).as("acctbal"),
          col("c_mktsegment").as("segment"))
        .unionByName(
          Tables.customer(s, dir).filter(col("c_custkey") % 10 === 0)
            .select((col("c_custkey") + 1000000L).as("bk"),
              lit(1000.0).as("acctbal"), lit("NEW").as("segment")))
      graft.etl.Scd.scd2Load(master, delta, Seq("acctbal", "segment"), eff)
        .orderBy(col("bk").asc_nulls_first, col("valid_from").asc_nulls_first)
    },
    Some(s"""
      SELECT c_custkey AS bk, c_acctbal AS acctbal, c_mktsegment AS segment,
             DATE '2020-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to, 1 AS is_current
      FROM customer WHERE c_custkey % 10 <> 0
      UNION ALL
      SELECT c_custkey, c_acctbal, c_mktsegment,
             DATE '2020-01-01', DATE '$eff', 0
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey, c_acctbal + 100.0, c_mktsegment,
             DATE '$eff', NULL, 1
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey + 1000000, 1000.0, 'NEW',
             DATE '$eff', NULL, 1
      FROM customer WHERE c_custkey % 10 = 0
      ORDER BY bk ASC NULLS FIRST, valid_from ASC NULLS FIRST"""))

  /** op 59 — PROC APPEND + SORT NODUPKEY: append delta, keep latest per
    * business key by (event time desc, delta-wins) — window, not
    * dropDuplicates (G2). */
  private val etlIncrementalDedup = GraftQuery(
    "etl_incremental_dedup",
    (s, dir) => {
      val master = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"),
          lit("master").as("src"))
      val delta = Tables.orders(s, dir).filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), (col("o_totalprice") * 1.1).as("o_totalprice"),
          (col("o_orderdate") + expr("INTERVAL 1 DAY")).as("o_orderdate"),
          lit("delta").as("src"))
      val w = Window.partitionBy(col("o_orderkey"))
        .orderBy(col("o_orderdate").desc_nulls_last, col("src").asc_nulls_first)
      master.unionByName(delta)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
        .orderBy(col("o_orderkey").asc_nulls_first)
    },
    Some("""
      SELECT o_orderkey, o_totalprice, o_orderdate, src
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                    ORDER BY o_orderdate DESC NULLS LAST, src ASC NULLS FIRST) AS rn
        FROM (
          SELECT o_orderkey, o_totalprice, o_orderdate, 'master' AS src FROM orders
          UNION ALL
          SELECT o_orderkey, o_totalprice * 1.1, o_orderdate + INTERVAL 1 DAY, 'delta'
          FROM orders WHERE o_orderkey % 7 = 0))
      WHERE rn = 1
      ORDER BY o_orderkey ASC NULLS FIRST"""))

  /** op 60 — validate/split: rules evaluated once, rows routed clean/reject
    * with reason tags (the two-OUTPUT DATA step). */
  private val etlValidateSplit = GraftQuery(
    "etl_validate_split",
    (s, dir) => {
      val rules = array(
        when(col("l_discount") > 0.08, lit("disc_high")),
        when(col("l_tax") === 0.0, lit("tax_zero")),
        when(col("l_quantity") > 45.0, lit("qty_high")))
      Tables.lineitem(s, dir)
        .withColumn("errs", filter(rules, e => e.isNotNull))
        .withColumn("status", when(size(col("errs")) === 0, "ok").otherwise("reject"))
        .withColumn("err_tags", concat_ws(",", col("errs")))
        .select("l_orderkey", "l_linenumber", "status", "err_tags")
        .orderBy(col("l_orderkey").asc_nulls_first, col("l_linenumber").asc_nulls_first)
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
             CASE WHEN len(errs) = 0 THEN 'ok' ELSE 'reject' END AS status,
             COALESCE(array_to_string(errs, ','), '') AS err_tags
      FROM (
        SELECT l_orderkey, l_linenumber,
               list_filter([
                 CASE WHEN l_discount > 0.08 THEN 'disc_high' END,
                 CASE WHEN l_tax = 0.0 THEN 'tax_zero' END,
                 CASE WHEN l_quantity > 45.0 THEN 'qty_high' END], e -> e IS NOT NULL) AS errs
        FROM lineitem)
      ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST"""))

  /** op 61 — MD5(CATX('|',…)) CDC row fingerprint; nulls encoded as ''
    * explicitly so null≠'null' and hash is stable. */
  private val etlRowHash = GraftQuery(
    "etl_row_hash",
    (s, dir) =>
      Tables.customer(s, dir)
        .withColumn("row_hash", md5(concat_ws("|",
          col("c_custkey").cast(StringType),
          coalesce(col("c_name"), lit("")),
          coalesce(col("c_acctbal").cast(StringType), lit("")),
          coalesce(col("c_mktsegment"), lit("")))))
        .select("c_custkey", "row_hash")
        .orderBy(col("c_custkey").asc_nulls_first),
    Some("""
      SELECT c_custkey,
             md5(concat_ws('|', CAST(c_custkey AS VARCHAR),
                 COALESCE(c_name, ''), COALESCE(CAST(c_acctbal AS VARCHAR), ''),
                 COALESCE(c_mktsegment, ''))) AS row_hash
      FROM customer
      ORDER BY c_custkey ASC NULLS FIRST"""))

  /** op 62 — surrogate key over an explicit total order — NOT
    * monotonically_increasing_id (partition-dependent, non-contiguous) and
    * NOT an unpartitioned row_number window (single-reducer scale-killer).
    * etl.SurrogateKey assigns the same contiguous 1..N via range partition
    * + per-partition numbering + prefix-sum of partition counts, fully
    * parallel. Oracle stays the SQL ROW_NUMBER formulation — same contract,
    * different (scalable) physical shape. */
  private val etlSurrogateKey = GraftQuery(
    "etl_surrogate_key",
    (s, dir) =>
      graft.etl.SurrogateKey.assign(
          Tables.customer(s, dir).select("c_custkey", "c_name"),
          Seq(col("c_custkey").asc_nulls_first))
        .select("sk", "c_custkey", "c_name")
        .orderBy(col("sk").asc_nulls_first),
    Some("""
      SELECT ROW_NUMBER() OVER (ORDER BY c_custkey ASC NULLS FIRST) AS sk,
             c_custkey, c_name
      FROM customer
      ORDER BY sk ASC NULLS FIRST"""))

  /** SAS UPDATE statement (distinct from MERGE/SCD2): apply a transaction
    * set to a master BY key, where a MISSING transaction value does NOT
    * overwrite the master value — the SAS rule that makes UPDATE usable for
    * sparse corrections. One left join + per-column coalesce; the
    * transaction side is derived deterministically (every 10th key raises
    * acctbal by 100 with segment missing; every 7th renames the segment
    * with acctbal missing) so the oracle states the same join in SQL. */
  private val etlUpdateMaster = GraftQuery(
    "etl_update_master",
    (s, dir) => {
      val master = Tables.customer(s, dir)
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      val txn = Tables.customer(s, dir)
        .filter(col("c_custkey") % 10 === 0 || col("c_custkey") % 7 === 0)
        .select(col("c_custkey"),
          when(col("c_custkey") % 10 === 0, col("c_acctbal") + 100.0).as("t_acctbal"),
          when(col("c_custkey") % 7 === 0, concat(lit("seg-"), col("c_mktsegment"))).as("t_segment"))
      master.join(txn, Seq("c_custkey"), "left")
        .select(col("c_custkey"), col("c_name"),
          coalesce(col("t_acctbal"), col("c_acctbal")).as("acctbal"),
          coalesce(col("t_segment"), col("c_mktsegment")).as("segment"))
        .orderBy(col("c_custkey").asc_nulls_first)
    },
    Some("""
      WITH txn AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100.0 END AS t_acctbal,
               CASE WHEN c_custkey % 7 = 0 THEN 'seg-' || c_mktsegment END AS t_segment
        FROM customer WHERE c_custkey % 10 = 0 OR c_custkey % 7 = 0)
      SELECT m.c_custkey, m.c_name,
             COALESCE(t.t_acctbal, m.c_acctbal) AS acctbal,
             COALESCE(t.t_segment, m.c_mktsegment) AS segment
      FROM customer m LEFT JOIN txn t ON m.c_custkey = t.c_custkey
      ORDER BY m.c_custkey ASC NULLS FIRST"""))

  /** PROC COMPARE: cell-level diff of two datasets BY key — one row per
    * (key, column) whose values differ, with both sides stringified
    * (doubles through DECIMAL(18,4) so both engines format identically).
    * The "B" side is the master with deterministic planted mutations. The
    * Spark side is the general mechanism (array of per-column structs →
    * explode → filter on null-safe inequality): adding a compared column
    * is one list entry, and the explode is map-side — at 100 TB the only
    * shuffle is the join BY key. */
  private val etlCompareDatasets = GraftQuery(
    "etl_compare_datasets",
    (s, dir) => {
      val a = Tables.orders(s, dir)
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority").as("a")
      val b = Tables.orders(s, dir)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 101 === 0, lit("X")).otherwise(col("o_orderstatus")).as("o_orderstatus"),
          when(col("o_orderkey") % 97 === 0, col("o_totalprice") + 1.5).otherwise(col("o_totalprice")).as("o_totalprice"),
          col("o_orderpriority")).as("b")
      def str(c: org.apache.spark.sql.Column, isMoney: Boolean) =
        if (isMoney) c.cast(graft.Det.Money).cast(StringType) else c.cast(StringType)
      val compared = Seq(("o_orderstatus", false), ("o_totalprice", true), ("o_orderpriority", false))
      a.join(b, col("a.o_orderkey") === col("b.o_orderkey"))
        .select(col("a.o_orderkey").as("o_orderkey"),
          explode(array(compared.map { case (c, m) =>
            struct(lit(c).as("col_name"),
              str(col(s"a.$c"), m).as("val_a"), str(col(s"b.$c"), m).as("val_b"))
          }: _*)).as("d"))
        .filter(!(col("d.val_a") <=> col("d.val_b")))
        .select(col("o_orderkey"), col("d.col_name").as("col_name"),
          col("d.val_a").as("val_a"), col("d.val_b").as("val_b"))
        .orderBy(col("o_orderkey").asc_nulls_first, col("col_name").asc_nulls_first)
    },
    Some("""
      WITH b AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 101 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1.5 ELSE o_totalprice END AS o_totalprice,
               o_orderpriority
        FROM orders),
      diffs AS (
        SELECT a.o_orderkey, 'o_orderstatus' AS col_name,
               a.o_orderstatus AS val_a, b.o_orderstatus AS val_b
        FROM orders a JOIN b ON a.o_orderkey = b.o_orderkey
        WHERE a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
        UNION ALL
        SELECT a.o_orderkey, 'o_totalprice',
               CAST(CAST(a.o_totalprice AS DECIMAL(18,4)) AS VARCHAR),
               CAST(CAST(b.o_totalprice AS DECIMAL(18,4)) AS VARCHAR)
        FROM orders a JOIN b ON a.o_orderkey = b.o_orderkey
        WHERE a.o_totalprice IS DISTINCT FROM b.o_totalprice
        UNION ALL
        SELECT a.o_orderkey, 'o_orderpriority', a.o_orderpriority, b.o_orderpriority
        FROM orders a JOIN b ON a.o_orderkey = b.o_orderkey
        WHERE a.o_orderpriority IS DISTINCT FROM b.o_orderpriority)
      SELECT o_orderkey, col_name, val_a, val_b FROM diffs
      ORDER BY o_orderkey ASC NULLS FIRST, col_name ASC NULLS FIRST"""))

  /** INCREMENTAL ROLLUP MAINTENANCE (etl.Rollup): the nightly-load refresh
    * pattern — the materialized rollup lives in mergeable partial form
    * (COUNT + exact decimal SUMs) and each delta batch is folded in with a
    * union + re-aggregate over GROUP rows, never a rescan of the base.
    * Here the corpus is split into a base (90%) and a delta
    * (l_orderkey % 10 = 0), both rolled up independently and merged; the
    * oracle is the FULL RECOMPUTE over everything — decimal-sum
    * associativity makes the incremental result bit-identical to it, the
    * property that lets a production pipeline audit an incrementally
    * maintained rollup against a periodic full rebuild.
    *
    * 100 TB shape: the delta scan is the only data-sized input; the base
    * contributes |groups| rows. Both partials keep map-side combine; the
    * merge shuffles only group rows. */
  private val etlIncrementalRollup = GraftQuery(
    "etl_incremental_rollup",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val keys = Seq("l_returnflag", "l_linestatus")
      val measures = Seq("l_quantity", "l_extendedprice")
      val isDelta = col("l_orderkey") % 10 === 0
      val base = graft.etl.Rollup.partial(li.filter(!isDelta), keys, measures)
      val delta = graft.etl.Rollup.partial(li.filter(isDelta), keys, measures)
      graft.etl.Rollup.merge(Seq(base, delta), keys, measures)
        .select(col("l_returnflag"), col("l_linestatus"), col("n_rows"),
          col("sum_l_quantity").cast(DoubleType).as("sum_qty"),
          col("sum_l_extendedprice").cast(DoubleType).as("sum_price"),
          (col("sum_l_quantity").cast(DoubleType) /
            col("n_rows").cast(DoubleType)).as("avg_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },
    Some(s"""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
             ${Det.sqlSum("l_quantity")} AS sum_qty,
             ${Det.sqlSum("l_extendedprice")} AS sum_price,
             ${Det.sqlSum("l_quantity")} / CAST(COUNT(*) AS DOUBLE) AS avg_qty
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""))

  override def queries: Seq[GraftQuery] = Seq(
    etlScd2Load, etlIncrementalDedup, etlValidateSplit, etlRowHash, etlSurrogateKey,
    etlUpdateMaster, etlCompareDatasets, etlIncrementalRollup)
}
