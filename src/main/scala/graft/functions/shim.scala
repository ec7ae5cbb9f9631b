package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` Spark internals needed to expose a
  * custom Catalyst expression as a user-facing `Column` (the same
  * mechanism `org.apache.spark.sql.functions` uses internally). Kept to
  * two one-line forwarders so the dependency surface on internals stays
  * auditable.
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a SQL function on a live session (the imperative
    * counterpart to wiring `spark.sql.extensions` at session build).
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession, name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)

  /** Wrap a logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`) — needed to hand a custom LogicalPlan node back to
    * the user-facing API.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan):
      org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Idempotently add a planner strategy to a live session (the
    * imperative counterpart to `injectPlannerStrategy` at session build).
    */
  def addStrategy(spark: org.apache.spark.sql.SparkSession,
                  strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }

  /** The RDD a `localCheckpoint(eager = true)` Dataset actually persisted
    * (its analyzed plan is a `LogicalRDD` over that RDD). Needed to free
    * checkpoint storage explicitly: `Dataset.queryExecution.toRdd` builds
    * a fresh wrapper RDD, so unpersisting it is a no-op, and checkpoint
    * persists are RDD-level — `spark.catalog.clearCache()` can't see them.
    */
  def checkpointedRdd(df: org.apache.spark.sql.DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }
}
