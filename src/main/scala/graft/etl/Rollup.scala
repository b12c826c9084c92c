package graft.etl

import graft.Det
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the nightly-load answer to "don't
  * rescan 100 TB to refresh a rollup": keep the materialized rollup in
  * MERGEABLE partial form (COUNT + exact decimal SUM per measure), fold
  * each day's delta in with a union + re-aggregate over the GROUP rows,
  * and derive display values (double sums, averages) only at read time.
  *
  * Exactness: decimal addition is associative and commutative, so
  * merge(partial(A), partial(B)) is BIT-IDENTICAL to partial(A ∪ B) —
  * any chunking of the input (daily loads, backfills, out-of-order
  * arrivals) converges to the same rollup, which is what makes the
  * incremental form safely idempotent to re-derive and audit against a
  * full recompute. The same closure property is why the merge cost is
  * O(|groups| + |delta|): the base table is never touched again, only
  * its rollup rows.
  *
  * Scope: COUNT/SUM (and anything derivable: AVG, rates) merge exactly;
  * MIN/MAX merge trivially and could be added per measure; COUNT
  * DISTINCT does not merge exactly — at scale that column rides along as
  * a mergeable sketch (HLL union, the agg_approx_distinct surface) or is
  * recomputed from a keyed dedup table.
  */
object Rollup {

  /** Mergeable partial rollup of `measures` grouped by `keys`:
    * `n_rows` + one exact `DECIMAL(18,4)` sum per measure. */
  def partial(df: DataFrame, keys: Seq[String], measures: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      measures.map(m => sum(col(m).cast(Det.Money)).as(s"sum_$m"))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge any number of partial rollups into one (associative — the
    * result is independent of chunking and merge order). */
  def merge(parts: Seq[DataFrame], keys: Seq[String], measures: Seq[String]): DataFrame = {
    val aggs = sum(col("n_rows")).as("n_rows") +:
      measures.map(m => sum(col(s"sum_$m")).as(s"sum_$m"))
    parts.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
