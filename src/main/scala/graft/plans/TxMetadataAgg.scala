package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Coalesce, ExprId, Expression, Literal, NamedExpression, Subtract}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.TxLogRelation

/** Metadata-only aggregates over a `graft-txlog` relation — the Delta
  * `OptimizeMetadataOnlyQuery` move as a `Rule[LogicalPlan]`, extended
  * to everything the manifest's per-file stats answer EXACTLY:
  *
  *  - `count(*)` / `count(1)`  → Σ per-file row counts
  *  - `count(col)`             → Σ rows − Σ per-file null counts
  *  - `min(col)` / `max(col)`  → fold of per-file min/max (exact —
  *    collectStats computed them with a real aggregate at write time,
  *    and SQL min/max ignore NULLs exactly like the stats do)
  *
  * A groupless aggregate whose every output is built from those shapes
  * (no DISTINCT, no FILTER clause, no WHERE below, no other aggregate
  * functions) has its SCAN CHILD replaced by a tiny [[LocalRelation]]
  * of per-file stats rows and each aggregate rewritten over it —
  * Catalyst's own aggregation folds the manifest numbers, reusing its
  * type handling instead of re-implementing evaluation driver-side.
  * Any shape the stats cannot answer exactly — a predicate, a
  * grouping, `avg`/`sum` (their inputs aren't in the stats), a file
  * missing its stats entry or the requested column's stats — keeps the
  * scan; a metadata answer is never a guess.
  *
  * The rewrite pins the relation's snapshot version exactly like a
  * scan would ([[TxLogRelation.pinnedStats]]), so a metadata-answered
  * aggregate and a later scan of the same DataFrame describe the same
  * committed version. Stats strings parse back through a `Cast` in the
  * session timezone — the same render/parse pair the write side used.
  *
  * At 100 TB this turns the most common sanity queries a pipeline
  * runs — "how many rows landed, what date range is loaded?" — from
  * full scans into one manifest read.
  */
object TxMetadataAgg extends Rule[LogicalPlan] {

  /** The supported aggregate shapes, keyed by what they need from the
    * stats relation.
    */
  private sealed trait Shape
  private case object CountStar extends Shape
  private final case class CountCol(col: String) extends Shape
  private final case class MinCol(col: String) extends Shape
  private final case class MaxCol(col: String) extends Shape

  private def shapeOf(ae: AggregateExpression,
      nameOf: Map[ExprId, String]): Option[Shape] =
    if (ae.isDistinct || ae.filter.nonEmpty) None
    else ae.aggregateFunction match {
      case Count(Seq(Literal(v, _))) if v != null => Some(CountStar)
      case Count(Seq(a: AttributeReference)) => nameOf.get(a.exprId).map(CountCol)
      case Min(a: AttributeReference) => nameOf.get(a.exprId).map(MinCol)
      case Max(a: AttributeReference) => nameOf.get(a.exprId).map(MaxCol)
      case _ => None
    }

  /** The aggregate child must reach the relation through deterministic
    * projections — a Filter/Join/generator changes what the stats
    * describe (row count included). Returns the relation plus the
    * attribute→table-column map; only plain (possibly re-aliased)
    * column references map through, so a COMPUTED projection stays
    * eligible for `count(*)` but disqualifies `min`/`max`/`count(col)`
    * over it.
    */
  private def relationOf(p: LogicalPlan)
      : Option[(TxLogRelation, Map[ExprId, String])] = p match {
    case l: LogicalRelation => l.relation match {
      // keyed by ExprId: catalog-resolved references carry a qualifier,
      // which Attribute equality includes — the id is the identity
      case r: TxLogRelation => Some((r, l.output.map(a => a.exprId -> a.name).toMap))
      case _ => None
    }
    case Project(projectList, child) if projectList.forall(_.deterministic) =>
      relationOf(child).map { case (r, names) =>
        (r, projectList.collect {
          case a: AttributeReference if names.contains(a.exprId) =>
            a.exprId -> names(a.exprId)
          case al @ Alias(a: AttributeReference, _) if names.contains(a.exprId) =>
            al.exprId -> names(a.exprId)
        }.toMap)
      }
    case _ => None
  }

  /** Every output expression must decompose into supported aggregate
    * shapes plus deterministic attribute-free scalar glue.
    */
  private def answerable(e: Expression, nameOf: Map[ExprId, String]): Boolean =
    e match {
      case ae: AggregateExpression => shapeOf(ae, nameOf).isDefined
      case _: AttributeReference => false
      case l if l.deterministic => l.children.forall(answerable(_, nameOf))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate if agg.groupingExpressions.isEmpty &&
        relationOf(agg.child).exists { case (_, nameOf) =>
          agg.aggregateExpressions.forall(answerable(_, nameOf)) &&
            agg.aggregateExpressions.exists(_.exists(_.isInstanceOf[AggregateExpression]))
        } =>
      val (rel, nameOf) = relationOf(agg.child).get
      rewrite(agg, rel, nameOf).getOrElse(agg)
  }

  private def rewrite(agg: Aggregate, rel: TxLogRelation,
      nameOf: Map[ExprId, String]): Option[LogicalPlan] = {
    val entries = rel.pinnedStats.getOrElse(return None)
    // the set of table columns the aggregates touch; every file with
    // rows must carry stats for each of them or the answer is a guess
    val needed = agg.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => shapeOf(ae, nameOf).get
    }).collect {
      case CountCol(c) => c
      case MinCol(c) => c
      case MaxCol(c) => c
    }.distinct
    if (!needed.forall(c => entries.forall(e => e.rows == 0L || e.stats.contains(c))))
      return None

    // per-file stats relation: __rows, then (__mn_c, __mx_c, __nc_c)
    // per needed column — strings exactly as the manifest stores them
    val schemaOfTable = rel.schema
    val statsAttrs: Seq[AttributeReference] =
      AttributeReference("__rows", LongType, nullable = false)() +:
        needed.flatMap { c => Seq(
          AttributeReference(s"__mn_$c", StringType)(),
          AttributeReference(s"__mx_$c", StringType)(),
          AttributeReference(s"__nc_$c", LongType, nullable = false)()) }
    val rows = entries.map { e =>
      val vals: Seq[Any] = e.rows +: needed.flatMap { c =>
        if (e.rows == 0L) Seq(null, null, 0L)
        else {
          val st = e.stats(c)
          Seq(st.min.map(UTF8String.fromString).orNull,
            st.max.map(UTF8String.fromString).orNull, st.nulls)
        }
      }
      new GenericInternalRow(vals.toArray[Any])
    }
    val statsRel = LocalRelation(statsAttrs, rows)
    val byName = statsAttrs.map(a => a.name -> a).toMap
    val tz = Option(conf.sessionLocalTimeZone)

    def sumOf(a: Attribute): Expression =
      Sum(a).toAggregateExpression()
    // transformUp: the replacement subtrees contain fresh Sum/Min/Max
    // AggregateExpressions that must not be re-matched by this rule
    def rewritten(ne: NamedExpression): NamedExpression =
      ne.transformUp {
        case ae: AggregateExpression => shapeOf(ae, nameOf).get match {
          case CountStar =>
            Coalesce(Seq(sumOf(byName("__rows")), Literal(0L)))
          case CountCol(c) =>
            Coalesce(Seq(
              Subtract(sumOf(byName("__rows")), sumOf(byName(s"__nc_$c"))),
              Literal(0L)))
          case MinCol(c) =>
            Min(Cast(byName(s"__mn_$c"), schemaOfTable(c).dataType, tz))
              .toAggregateExpression()
          case MaxCol(c) =>
            Max(Cast(byName(s"__mx_$c"), schemaOfTable(c).dataType, tz))
              .toAggregateExpression()
        }
      }.asInstanceOf[NamedExpression]
    // Alias exprIds survive the transform (withNewChildren preserves
    // them), so downstream references keep resolving
    Some(Aggregate(Nil, agg.aggregateExpressions.map(rewritten), statsRel))
  }
}
