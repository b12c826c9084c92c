package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical AS-OF JOIN (SURVEY §2 op 25, custom-operator path (c)): for each
  * left row, attach the single right row with the greatest `rightTs` ≤
  * `leftTs` within the same key — the operator SAS expresses as sorted
  * MERGE + RETAIN carry-forward and Spark lacks natively.
  *
  * Left-outer semantics: unmatched left rows keep null right columns.
  * Keys are equi (one expression per side); ts must be an ordered type
  * whose internal representation is a long (timestamp/long).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}
