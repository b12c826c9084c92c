package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: under a DISTINCT-enforcing aggregate, union branches
  * that are filtered projections of the SAME leaf relation merge into one
  * branch with the conditions OR'd —
  *
  *   SELECT k FROM t WHERE p UNION SELECT k FROM t WHERE q
  *     ⇒  distinct(SELECT k FROM t WHERE p OR q)
  *
  * Each union branch is an independent subtree to Spark, so the declarative
  * form scans `t` once PER BRANCH; this rewrite halves (or better) the scan
  * volume, and the OR'd condition still reaches the parquet reader as one
  * pushed filter. At 100 TB the duplicated branch scan is the entire cost
  * of the query.
  *
  * Soundness: a row satisfying several branch conditions appears once in
  * the merged scan but multiple times in the union — a MULTIPLICITY change,
  * which is exactly what the distinct parent erases. The rule therefore
  * only fires under an Aggregate with NO aggregate functions (the shape
  * `Distinct`/`Deduplicate`-on-all-columns optimizes to; a grouping-only
  * aggregate is multiplicity-insensitive by definition) — never on a bare
  * UNION ALL, and never under count()/sum() aggregates, whose results DO
  * depend on multiplicity. Branch projections must match (attribute-
  * remapped, semantic compare) and everything involved must be
  * deterministic; anything else falls through untouched.
  *
  * Registered per-session via `experimental.extraOptimizations`
  * (GraftFunctions.register), which runs AFTER the main optimizer batches —
  * by then `.distinct()` has been rewritten to the Aggregate shape, filters
  * are pushed into the branches and columns pruned, so the match sees the
  * stable optimized form Project(Filter(leaf)).
  */
object MergeUnionScans extends Rule[LogicalPlan] {

  /** Grouping-only aggregate: dedups groups, never counts them — the
    * multiplicity-insensitive parent the merge needs. */
  private def multiplicityInsensitive(agg: Aggregate): Boolean =
    agg.aggregateExpressions.forall(ae =>
      ae.deterministic && !ae.exists(_.isInstanceOf[AggregateExpression])) &&
      agg.groupingExpressions.forall(_.deterministic)

  /** A mergeable branch: deterministic Project over deterministic Filter
    * over a leaf relation. */
  private def parts(p: LogicalPlan): Option[(Seq[NamedExpression], Expression, LeafNode)] =
    p match {
      case Project(ps, Filter(c, leaf: LeafNode))
          if ps.forall(_.deterministic) && c.deterministic =>
        Some((ps, c, leaf))
      case _ => None
    }

  private def tryMerge(a: LogicalPlan, b: LogicalPlan): Option[LogicalPlan] =
    (parts(a), parts(b)) match {
      case (Some((ps1, c1, l1)), Some((ps2, c2, l2)))
          if l1.sameResult(l2) && l1.output.length == l2.output.length =>
        // same relation, two attribute instancings: remap b's expressions
        // onto a's output positionally (sameResult ⇒ same schema order)
        val attrMap = AttributeMap(l2.output.zip(l1.output))
        def remap(e: Expression): Expression = e.transform {
          case at: Attribute => attrMap.getOrElse(at, at)
        }
        val ps2r = ps2.map(remap)
        val sameProjection = ps1.length == ps2r.length &&
          ps1.zip(ps2r).forall { case (x, y) => x.semanticEquals(y) }
        if (sameProjection) Some(Project(ps1, Filter(Or(c1, remap(c2)), l1)))
        else None
      case _ => None
    }

  /** Fold each branch into the first mergeable earlier branch. The head
    * branch keeps its output attribute ids, so Union.output (= head
    * output) stays valid for the parent aggregate's references. */
  private def mergeChildren(children: Seq[LogicalPlan]): Seq[LogicalPlan] =
    children.foldLeft(Vector.empty[LogicalPlan]) { (acc, ch) =>
      var merged = false
      val next = acc.map { existing =>
        if (merged) existing
        else tryMerge(existing, ch) match {
          case Some(m) => merged = true; m
          case None => existing
        }
      }
      if (merged) next else next :+ ch
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(_, _, u: Union, _) if multiplicityInsensitive(agg) =>
      val mergedChildren = mergeChildren(u.children)
      if (mergedChildren.length == u.children.length) agg
      else if (mergedChildren.length == 1) agg.copy(child = mergedChildren.head)
      else agg.copy(child = u.copy(children = mergedChildren))
  }
}
