package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.TimestampType

import graft.sources.TxLog

/** SQL time travel over graft-txlog CATALOG tables — makes
  *
  * {{{
  *   SELECT … FROM t VERSION AS OF 5
  *   SELECT … FROM t TIMESTAMP AS OF '2026-01-01 12:00:00'
  * }}}
  *
  * work with Spark's own standard syntax. The parser/analyzer already
  * produce a `RelationTimeTravel` node, but only v2 tables implement
  * the interface — this resolution rule intercepts the node when its
  * target is a registered graft-txlog table and substitutes the
  * versioned v1 relation (exactly the `graft_tx_read(path, version)`
  * TVF's semantics, now reachable by table NAME with standard SQL).
  * Timestamps resolve through [[TxLog.versionAtTimestamp]] — the same
  * commit-wall-clock walk the Scala API and RESTORE use. Non-graft
  * targets pass through untouched (native v2 behavior preserved).
  *
  * Applied from [[GraftSqlParser.parsePlan]] on the freshly PARSED
  * plan, not as an analyzer rule: the built-in ResolveRelations throws
  * UNSUPPORTED_FEATURE.TIME_TRAVEL for v1 relations before any
  * injected resolution rule can run, so the node must be replaced
  * before analysis starts (the same "resolve during analysis" stance
  * the graft TVFs take).
  */
case class TxTimeTravelRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def identOf(u: UnresolvedRelation): TableIdentifier = {
    val parts = u.multipartIdentifier
    TableIdentifier(parts.last,
      if (parts.length > 1) Some(parts(parts.length - 2)) else None)
  }

  private def tsMillisOf(e: Expression): Long = {
    require(e.resolved && e.foldable,
      "graft-txlog TIMESTAMP AS OF needs a literal timestamp expression")
    val micros = Cast(e, TimestampType,
      Some(spark.sessionState.conf.sessionLocalTimeZone)).eval(null)
    require(micros != null,
      s"graft-txlog TIMESTAMP AS OF: '${e.sql}' is not a valid timestamp")
    micros.asInstanceOf[Long] / 1000L
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, ver) =>
      TxSqlDmlStrategy.txTableOf(identOf(u)).map { path =>
        val v = ver match {
          case Some(s) =>
            require(s.forall(_.isDigit),
              s"graft-txlog VERSION AS OF: '$s' is not a version number")
            s.toLong
          case None => TxLog.versionAtTimestamp(spark, path, tsMillisOf(ts.get))
        }
        spark.baseRelationToDataFrame(
          new graft.sources.TxLogRelation(spark, path, Some(v)))
          .queryExecution.analyzed
      }.getOrElse(tt)
  }
}
