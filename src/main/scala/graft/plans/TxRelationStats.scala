package graft.plans

import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.expressions.AttributeMap
import org.apache.spark.sql.catalyst.plans.logical.{ColumnStat, LogicalPlan, Statistics}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.streaming.SparkDataStream
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.sources.BaseRelation

import graft.sources.TxLogRelation

/** Exact-cardinality statistics for graft-txlog relations.
  *
  * A v1 `LogicalRelation` reports only `sizeInBytes` (which already
  * drives auto-broadcast); its `computeStats` has no row-count channel
  * unless a catalog table carries ANALYZE results. But the manifest
  * KNOWS the exact live row count — the per-file counts are recorded at
  * write time — so the optimizer should never have to guess cardinality
  * for a transactional table: CBO join reordering and filter
  * selectivity start from the true row count, zero ANALYZE runs needed
  * (the Delta "statistics from the log" stance).
  *
  * [[TxStatsRelation]] subclasses `LogicalRelation` (it IS one — every
  * pattern match, strategy, and scan path keeps working) overriding
  * only `computeStats`; this rule wraps each graft relation whose
  * manifest can answer exactly. Deletion-vectored snapshots or
  * incomplete per-file stats answer None and stay unwrapped — a
  * cardinality is never a guess.
  */
class TxStatsRelation(
    relation: BaseRelation,
    output: Seq[AttributeReference],
    catalogTable: Option[CatalogTable],
    isStreaming: Boolean,
    stream: Option[SparkDataStream],
    val rowCount: BigInt,
    val colStats: Map[String, ColumnStat])
  extends LogicalRelation(relation, output, catalogTable, isStreaming,
    stream) {

  override def computeStats(): Statistics =
    Statistics(sizeInBytes = relation.sizeInBytes,
      rowCount = Some(rowCount),
      attributeStats = AttributeMap(output.flatMap(a =>
        colStats.get(a.name).map(a -> _))))

  // a self-join dedup re-instance must keep the exact cardinality too
  override def newInstance(): LogicalRelation =
    new TxStatsRelation(relation,
      output.map(_.newInstance()), catalogTable, isStreaming, stream,
      rowCount, colStats)

  // the inherited case-class equality would make this node == the
  // unwrapped original, and TreeNode.mapChildren KEEPS the old child
  // when the new one compares equal — the wrap would silently vanish
  // from the transformed tree. Equality must see the difference.
  // (Plan-reuse machinery compares CANONICALIZED plans, which
  // doCanonicalize renders as plain LogicalRelation copies on both
  // sides — exchange/subquery reuse is unaffected.)
  override def equals(other: Any): Boolean = other match {
    case o: TxStatsRelation => o.rowCount == rowCount && super.equals(other)
    case _ => false
  }

  // the generated case-class equals calls that.canEqual(this) — without
  // this override a plain LogicalRelation still compared EQUAL to the
  // wrap (old == new), and mapChildren kept the old child
  override def canEqual(that: Any): Boolean =
    that.isInstanceOf[TxStatsRelation]

  override def hashCode(): Int = 31 * super.hashCode() + rowCount.hashCode()

  // makeCopy/clone build the copy reflectively from the case-class
  // product (5 args) — the extra ctor params must ride along, in order
  override protected def otherCopyArgs: Seq[AnyRef] = Seq(rowCount, colStats)
}

object TxRelationStats extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case lr @ LogicalRelation(r: TxLogRelation, out, ct, streaming, st)
        if !lr.isInstanceOf[TxStatsRelation] =>
      r.metadataCount match {
        case Some(n) =>
          // per-column ranges feed ONLY the CBO's estimators — folding
          // them over every file's stats is priced per plan, so compute
          // them only when CBO is on (the sole consumer)
          val cols: Map[String, ColumnStat] =
            if (!conf.cboEnabled) Map.empty
            else r.pinnedColumnStats.map { case (name, (mn, mx, nulls)) =>
              name -> ColumnStat(min = mn, max = mx,
                nullCount = Some(BigInt(nulls)))
            }
          new TxStatsRelation(r, out, ct, streaming, st, BigInt(n), cols)
        case None => lr
      }
  }
}
