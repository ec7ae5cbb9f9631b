package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.sources.TxLogRelation

/** Metadata-only `COUNT(*)` over a `graft-txlog` relation — the Delta
  * `OptimizeMetadataOnlyQuery` move as a `Rule[LogicalPlan]`: a
  * groupless aggregate whose every output is a bare `count(*)` /
  * `count(1)` (no DISTINCT, no FILTER clause, no grouping, no
  * predicate below) over a [[graft.sources.TxLogRelation]] is replaced
  * with a one-row [[LocalRelation]] holding the manifest's summed
  * per-file row counts — the scan never runs. Any shape the manifest
  * cannot answer EXACTLY — a WHERE, a `count(col)` (null-sensitive), a
  * grouping, a file missing its recorded count — leaves the plan
  * untouched and pays the scan; a metadata answer is never a guess.
  *
  * The rewrite asks the relation for its count through
  * [[TxLogRelation.metadataCount]], which pins the snapshot version
  * exactly like a scan would — `count(*)` and a subsequent scan of the
  * same DataFrame describe the same committed version.
  *
  * Registered via `injectOptimizerRule` (GraftExtensions), so it fires
  * for `df.count()`, `SELECT count(*)` over a catalog
  * `USING graft-txlog` table, and every other SQL spelling. At 100 TB
  * this turns the most common sanity query a pipeline runs — "how many
  * rows landed?" — from a full scan into one manifest read.
  */
object TxMetadataCount extends Rule[LogicalPlan] {

  private def isCountStar(e: Expression): Boolean = e match {
    case ae: AggregateExpression =>
      !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
        case Count(Seq(Literal(v, _))) => v != null
        case _ => false
      })
    case _ => false
  }

  /** Only count-star aggregates are answerable, and every OTHER
    * expression in the output must be free of aggregates/attributes
    * (a literal like `SELECT count(*), 'tag'` is fine).
    */
  private def answerable(e: Expression): Boolean = e match {
    case _ if isCountStar(e) => true
    case _: AggregateExpression => false
    case l if l.references.isEmpty && l.deterministic =>
      l.children.forall(answerable)
    case _ => false
  }

  /** The aggregate child must reach the relation through projections
    * only — a Filter/Join/anything else means the count is no longer
    * the table's row count.
    */
  private def relationOf(p: LogicalPlan): Option[TxLogRelation] = p match {
    case l: LogicalRelation => l.relation match {
      case r: TxLogRelation => Some(r)
      case _ => None
    }
    case Project(projectList, child) if projectList.forall(_.deterministic) =>
      relationOf(child)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate
        if agg.groupingExpressions.isEmpty &&
          agg.aggregateExpressions.forall(answerable) &&
          agg.aggregateExpressions.exists(e => e.exists(isCountStar)) &&
          relationOf(agg.child).isDefined =>
      relationOf(agg.child).flatMap(_.metadataCount) match {
        case Some(n) =>
          // substitute the count into each output expression, then fold
          // the now-literal-only row into a LocalRelation
          val rewritten = agg.aggregateExpressions.map { ne =>
            ne.transform { case e if isCountStar(e) => Literal(n) }
          }
          val row = new GenericInternalRow(
            rewritten.map(_.eval(null)).toArray[Any])
          LocalRelation(agg.output, Seq(row))
        case None => agg // incomplete stats: keep the scan
      }
  }
}
