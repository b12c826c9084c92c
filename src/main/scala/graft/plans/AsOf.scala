package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Planner strategy mapping the logical AsOfJoinPlan onto its physical
  * merge exec (custom-operator path (c): LogicalPlan → Strategy →
  * SparkPlan, injected per-session via experimental.extraStrategies). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** User-facing AS-OF JOIN on DataFrames.
  *
  * `AsOf.join(left, right, key, leftTs, rightTs)`: every left row gains the
  * right row with the greatest rightTs ≤ its leftTs for the same key
  * (left-outer; right columns null when no prior row exists).
  */
object AsOf {

  def join(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
      leftTs: String, rightTs: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def resolve(plan: LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${plan.output.map(_.name)}"))
    val node = AsOfJoinPlan(lPlan, rPlan,
      resolve(lPlan, leftKey), resolve(rPlan, rightKey),
      resolve(lPlan, leftTs), resolve(rPlan, rightTs))
    org.apache.spark.sql.graftbridge.Bridge.ofRows(spark, node)
  }
}
