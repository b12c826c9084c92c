package graft.operators

import graft.{GraftQuery, QueryGroup, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY.md §2-F+G: sort / limit / top-k (ops 44–46) and set ops (47–49).
  *
  * SAS semantics covered: PROC SORT (missings sort FIRST), PROC SORT
  * NODUPKEY (keep first in sort order — deterministic, unlike Spark's
  * dropDuplicates), OUTOBS= top-k, SET a b (align by NAME), UNION /
  * INTERSECT / EXCEPT.
  *
  * 100 TB notes: global sort is a range-partitioned shuffle (sampled
  * boundaries) — fine once, avoid re-sorting per stage. Top-k compiles to
  * TakeOrderedAndProject: per-partition heaps + driver merge of k rows, no
  * full sort — THE pattern for "top N of 100 TB". NODUPKEY as
  * window-row_number=1 is one shuffle on the key; at scale prefer it over
  * sort+drop since it needs no total order.
  */
object SortSetOps extends QueryGroup {

  /** op 44 — PROC SORT BY a DESCENDING b, with SAS missings-first and a
    * unique tiebreaker making the row order total. */
  private val sortMultikey = GraftQuery(
    "sort_multikey",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .withColumn("d", nullif(col("l_discount"), lit(0.0)))
        .select("l_orderkey", "l_linenumber", "d", "l_quantity")
        .orderBy(col("d").asc_nulls_first, col("l_quantity").desc_nulls_last,
          col("l_orderkey").asc_nulls_first, col("l_linenumber").asc_nulls_first),
    Some("""
      SELECT l_orderkey, l_linenumber, NULLIF(l_discount, 0.0) AS d, l_quantity
      FROM lineitem
      ORDER BY d ASC NULLS FIRST, l_quantity DESC NULLS LAST,
               l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST"""))

  /** op 45 — PROC SORT NODUPKEY: one row per customer = their earliest
    * order (tie → lowest orderkey). Deliberately window-based, not
    * dropDuplicates (gotcha G2: that keeps an arbitrary row). */
  private val dedupNodupkey = GraftQuery(
    "dedup_nodupkey",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc_nulls_first, col("o_orderkey").asc_nulls_first)
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .orderBy(col("o_custkey").asc_nulls_first)
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_orderdate
      FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC NULLS FIRST) AS rn
            FROM orders)
      WHERE rn = 1
      ORDER BY o_custkey ASC NULLS FIRST"""))

  /** op 46 — ORDER BY … OUTOBS=k: global top-k → TakeOrderedAndProject. */
  private val topkGlobal = GraftQuery(
    "topk_global",
    (s, dir) =>
      Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc_nulls_first)
        .limit(25),
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST
      LIMIT 25"""))

  /** op 47 — SET a b: concatenate BY NAME (SAS aligns variables by name;
    * missing columns become null) — `unionByName(allowMissingColumns)`,
    * never positional union. */
  private val setUnionAll = GraftQuery(
    "set_union_all",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val a = c.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), lit("bal").as("src"))
      val b = c.filter(col("c_mktsegment") === "MACHINERY")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), lit("seg").as("src"))
      a.unionByName(b, allowMissingColumns = true)
        .orderBy(col("c_custkey").asc_nulls_first, col("src").asc_nulls_first)
    },
    Some("""
      SELECT c_custkey, c_name, c_acctbal, 'bal' AS src, NULL AS c_mktsegment
      FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION ALL BY NAME
      SELECT c_custkey, c_name, c_mktsegment, 'seg' AS src
      FROM customer WHERE c_mktsegment = 'MACHINERY'
      ORDER BY c_custkey ASC NULLS FIRST, src ASC NULLS FIRST"""))

  /** op 48 — SQL UNION: deduplicating union of two key sets. The query
    * stays in its declarative two-branch form; the MergeUnionScans
    * optimizer rule (registered by GraftFunctions.register) collapses the
    * two same-table branches into ONE scan with the OR'd pushed filter —
    * sound because the distinct parent erases the multiplicity change.
    * Measured at sf6: 0.78 s (two scans) → 0.40 s (merged), and the
    * branch-duplicated scan was the whole super-linear residue of this
    * row's sf3→sf6 scaling. */
  private val setUnionDistinct = GraftQuery(
    "set_union_distinct",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val o = Tables.orders(s, dir)
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        .union(o.filter(col("o_orderstatus") === "P").select(col("o_custkey")))
        .distinct()
        .orderBy(col("o_custkey").asc_nulls_first)
    },
    Some("""
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      UNION
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
      ORDER BY o_custkey ASC NULLS FIRST"""))

  /** op 49 — INTERSECT/EXCEPT in one tagged result: customers with both
    * F and O orders vs customers with F but never O. */
  private val setIntersectExcept = GraftQuery(
    "set_intersect_except",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val oo = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      f.intersect(oo).withColumn("tag", lit("both"))
        .unionByName(f.except(oo).withColumn("tag", lit("f_only")))
        .orderBy(col("tag").asc_nulls_first, col("o_custkey").asc_nulls_first)
    },
    Some("""
      SELECT o_custkey, 'both' AS tag FROM
        (SELECT o_custkey FROM orders WHERE o_orderstatus='F'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus='O')
      UNION ALL
      SELECT o_custkey, 'f_only' AS tag FROM
        (SELECT o_custkey FROM orders WHERE o_orderstatus='F'
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderstatus='O')
      ORDER BY tag ASC NULLS FIRST, o_custkey ASC NULLS FIRST"""))

  /** SET a b; BY k — BY-group interleaving: concatenate two sorted inputs
    * and keep them interleaved by the BY key (SURVEY §2 exhaustiveness
    * note: = unionByName + orderBy, made explicit as its own op). Origin
    * tag breaks ties the way SAS's dataset order does. */
  private val setInterleaveBy = GraftQuery(
    "set_interleave_by",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val a = o.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey"), col("o_orderkey"), lit(1).as("ds"))
      val b = o.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey"), col("o_orderkey"), lit(2).as("ds"))
      a.unionByName(b)
        .orderBy(col("o_custkey").asc_nulls_first, col("ds").asc_nulls_first,
          col("o_orderkey").asc_nulls_first)
    },
    Some("""
      SELECT o_custkey, o_orderkey, ds FROM (
        SELECT o_custkey, o_orderkey, 1 AS ds FROM orders WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT o_custkey, o_orderkey, 2 AS ds FROM orders WHERE o_orderstatus = 'O')
      ORDER BY o_custkey ASC NULLS FIRST, ds ASC NULLS FIRST, o_orderkey ASC NULLS FIRST"""))

  override def queries: Seq[GraftQuery] = Seq(
    sortMultikey, dedupNodupkey, topkGlobal,
    setUnionAll, setUnionDistinct, setIntersectExcept, setInterleaveBy)
}
