package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Physical AS-OF JOIN: a co-partitioned, one-pass sorted merge.
  *
  * EnsureRequirements gives both children hash partitioning on the key and
  * per-partition ordering (key ASC, ts ASC); each partition pair is then
  * merged in a single forward scan — the right cursor advances while its
  * (key, ts) ≤ the left row's, carrying the latest right row per key. One
  * shuffle per side, O(n) merge, state = ONE buffered right row: the same
  * cost envelope as a sort-merge join, with no candidate-pair expansion on
  * dense keys (the failure mode of range-join + top-1 formulations).
  *
  * Implementation bounds (documented contract): key and ts must be
  * long-backed types (bigint / timestamp / timestamp_ntz — Spark stores
  * timestamps as epoch-micros longs internally), non-null on the right.
  * Left rows with a null key or ts get left-outer treatment (null right
  * columns) rather than accidentally matching key 0 / epoch 0.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    // capture only serializable expressions/attributes; code-generated
    // projections must be created per-partition on the executor
    val lOut = left.output
    val rOut = right.output
    val allOut = output
    val (lk, rk, lt, rt) = (leftKey, rightKey, leftTs, rightTs)
    val rightWidth = rOut.size

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = UnsafeProjection.create(Seq(lk), lOut)
      val lTs = UnsafeProjection.create(Seq(lt), lOut)
      val rKey = UnsafeProjection.create(Seq(rk), rOut)
      val rTs = UnsafeProjection.create(Seq(rt), rOut)
      // bind against nullable right attrs: unmatched rows carry nulls
      val out = UnsafeProjection.create(allOut, lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _          // lookahead right row
        private var rHeadKey = 0L
        private var rHeadTs = 0L
        private var haveHead = false
        private var matchRow: InternalRow = _       // latest right row ≤ current left
        private var matchKey = 0L
        private var haveMatch = false

        private def advanceRight(): Unit = {
          if (rIter.hasNext) {
            val r = rIter.next()
            rHeadKey = rKey(r).getLong(0)
            rHeadTs = rTs(r).getLong(0)
            rHead = r.copy()                        // rows are reused by the scan
            haveHead = true
          } else haveHead = false
        }

        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          // Null left key/ts: UnsafeProjection.getLong on NULL reads 0, which
          // would silently match right rows with key 0 (resp. ts = epoch 0).
          // Left-outer semantics instead: emit null right columns and leave
          // the cursor untouched (null keys sort first, so no rewind needed).
          val kProj = lKey(l)
          val tProj = lTs(l)
          if (kProj.isNullAt(0) || tProj.isNullAt(0)) {
            return out(joined(l, nullRight))
          }
          val k = kProj.getLong(0)
          val t = tProj.getLong(0)
          // drop any carried match from a previous key
          if (haveMatch && matchKey != k) haveMatch = false
          // advance the right cursor through rows with (key, ts) ≤ (k, t)
          while (haveHead && (rHeadKey < k || (rHeadKey == k && rHeadTs <= t))) {
            if (rHeadKey == k) { matchRow = rHead; matchKey = k; haveMatch = true }
            advanceRight()
          }
          out(if (haveMatch) joined(l, matchRow) else joined(l, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
