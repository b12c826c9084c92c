package graft

import graft.etl.Rollup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** etl.Rollup: the mergeable-partial contract behind etl_incremental_rollup.
  * The oracle row already proves merge(base, delta) == full recompute on
  * the registry shape; these pin the algebraic claims the oracle can't:
  * chunking-invariance (any split of the input converges) and merge-order
  * invariance (associativity of the decimal sums).
  */
class RollupSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private val keys = Seq("l_returnflag", "l_linestatus")
  private val measures = Seq("l_quantity", "l_extendedprice")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.orderBy(keys.map(col(_).asc): _*).collect().map(_.toSeq.toList).toSeq

  test("merge of any chunking is bit-identical to the full partial") {
    val li = Tables.lineitem(spark, sf)
    val full = canon(Rollup.partial(li, keys, measures))
    // three-way split on an unrelated key
    val parts3 = (0 until 3).map(i => Rollup.partial(li.filter(col("l_orderkey") % 3 === i), keys, measures))
    assert(canon(Rollup.merge(parts3, keys, measures)) == full)
    // uneven two-way split
    val parts2 = Seq(li.filter(col("l_orderkey") % 10 === 0), li.filter(col("l_orderkey") % 10 =!= 0))
      .map(Rollup.partial(_, keys, measures))
    assert(canon(Rollup.merge(parts2, keys, measures)) == full)
  }

  test("merge is order-invariant and re-mergeable (a merged rollup is itself a partial)") {
    val li = Tables.lineitem(spark, sf)
    val parts = (0 until 4).map(i => Rollup.partial(li.filter(col("l_orderkey") % 4 === i), keys, measures))
    val fwd = canon(Rollup.merge(parts, keys, measures))
    assert(canon(Rollup.merge(parts.reverse, keys, measures)) == fwd)
    // fold two-at-a-time: merge(merge(a,b), merge(c,d)) — the incremental path
    val ab = Rollup.merge(parts.take(2), keys, measures)
    val cd = Rollup.merge(parts.drop(2), keys, measures)
    assert(canon(Rollup.merge(Seq(ab, cd), keys, measures)) == fwd)
  }
}
