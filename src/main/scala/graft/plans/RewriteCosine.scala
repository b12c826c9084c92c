package graft.plans

import graft.functions.CosineSimilarity
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule (the third Catalyst extension point, after the custom
  * Expression and the custom plan/strategy): rewrites the DECLARATIVE
  * higher-order cosine pattern
  *
  *   aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,v) -> acc+v)
  *     / (sqrt(aggregate(transform(a, x -> x*x), 0.0, +)) *
  *        sqrt(aggregate(transform(b, x -> x*x), 0.0, +)))
  *
  * (what VectorOps.cosine builds, and what a user writing idiomatic Spark
  * SQL would write) into the codegen'd native CosineSimilarity kernel —
  * identical semantics (same accumulation order, same final ops, and the
  * kernel mirrors the declarative null-on-length-mismatch / null-element
  * edges), so the rewrite is a pure performance transformation the user
  * gets without changing their query. Injected per-session via
  * `experimental.extraOptimizations` (GraftFunctions.register).
  *
  * The matchers are deliberately strict — this rule fires on arbitrary user
  * plans, so every sub-shape is pinned: the fold zero must be literal 0.0,
  * each lambda body must combine exactly its own lambda variables (not e.g.
  * x*x or a captured column), and the aggregate's finish lambda must be the
  * identity. Anything else falls through untouched.
  */
object RewriteCosine extends Rule[LogicalPlan] {

  private def isZero(e: Expression): Boolean = e match {
    case Literal(v: Double, DoubleType) => v == 0.0
    case _ => false
  }

  /** finish lambda is identity: (acc) -> acc */
  private def isIdentityFinish(e: Expression): Boolean = e match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(v: NamedLambdaVariable), _) =>
      body.exprId == v.exprId
    case _ => false
  }

  /** merge lambda is exactly (acc, v) -> acc + v (either operand order). */
  private def isPlainSum(e: Expression): Boolean = e match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      (l.exprId == acc.exprId && r.exprId == v.exprId) ||
        (l.exprId == v.exprId && r.exprId == acc.exprId)
    case _ => false
  }

  private object DotAgg {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
            Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          zero, merge, finish)
          if mx.exprId == x.exprId && my.exprId == y.exprId &&
            isZero(zero) && isPlainSum(merge) && isIdentityFinish(finish) =>
        Some((a, b))
      case _ => None
    }
  }

  private object NormAgg {
    def unapply(e: Expression): Option[Expression] = e match {
      case Sqrt(ArrayAggregate(
          ArrayTransform(a, LambdaFunction(Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
            Seq(x: NamedLambdaVariable), _)),
          zero, merge, finish))
          if mx.exprId == x.exprId && my.exprId == x.exprId &&
            isZero(zero) && isPlainSum(merge) && isIdentityFinish(finish) =>
        Some(a)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Divide(DotAgg(a, b), Multiply(NormAgg(a2), NormAgg(b2), _), _)
        if a.semanticEquals(a2) && b.semanticEquals(b2) =>
      CosineSimilarity(a, b)
  }
}
