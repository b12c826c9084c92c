package graft.plans

import graft.functions.CosineSimilarity
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (the third Catalyst extension point, after the custom
  * Expression and the custom plan/strategy): rewrites the DECLARATIVE
  * higher-order cosine pattern
  *
  *   aggregate(zip_with(a, b, (x,y) -> x*y), 0, +)
  *     / (sqrt(aggregate(transform(a, x -> x*x), 0, +)) *
  *        sqrt(aggregate(transform(b, x -> x*x), 0, +)))
  *
  * (what VectorOps.cosine builds, and what a user writing idiomatic Spark
  * SQL would write) into the codegen'd native CosineSimilarity kernel —
  * bit-identical semantics (same accumulation order, same final ops), so
  * the rewrite is a pure performance transformation the user gets without
  * changing their query. Injected per-session via
  * `experimental.extraOptimizations` (GraftFunctions.register).
  */
object RewriteCosine extends Rule[LogicalPlan] {

  private object DotAgg {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(_: Multiply, _, _)),
          _, LambdaFunction(_: Add, _, _), _) => Some((a, b))
      case _ => None
    }
  }

  private object NormAgg {
    def unapply(e: Expression): Option[Expression] = e match {
      case Sqrt(ArrayAggregate(
          ArrayTransform(a, LambdaFunction(_: Multiply, _, _)),
          _, LambdaFunction(_: Add, _, _), _)) => Some(a)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Divide(DotAgg(a, b), Multiply(NormAgg(a2), NormAgg(b2), _), _)
        if a.semanticEquals(a2) && b.semanticEquals(b2) =>
      CosineSimilarity(a, b)
  }
}
