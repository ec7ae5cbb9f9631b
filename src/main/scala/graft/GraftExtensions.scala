package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CosineSim, DotProduct, HeavyHitters}
import org.apache.spark.sql.graftshim.Shim

/** Session extension entry point: registers graft's native expressions as
  * SQL functions. Wire it at session build —
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * — or call [[GraftExtensions.register]] on a live session. Either way,
  * `SELECT graft_dot(a, b)` / `graft_cosine(a, b)` become available to
  * pure-SQL users with the same codegen'd implementation the DataFrame
  * API uses.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFunction)
    ext.injectFunction(GraftExtensions.cosineFunction)
    ext.injectFunction(GraftExtensions.heavyHittersFunction)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    // pre-CBO: runs AFTER the default optimizer batches, so it sees (and
    // replaces) an InferWindowGroupLimit-inserted WindowGroupLimit child
    ext.injectPreCBORule(_ => graft.plans.WindowTopKRewrite)
  }
}

object GraftExtensions {

  // SQL-surface input coercion: wrap arguments in a cast to array<double>
  // so graft_dot/graft_cosine on array<float> (embeddings' storage type)
  // read correctly instead of getDouble-misreading 4-byte elements; the
  // cast is a no-op for array<double> inputs.
  private def toDoubleArray(
      e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType))

  private val dotInfo = new ExpressionInfo(
    classOf[DotProduct].getName, null, "graft_dot",
    "graft_dot(a, b) - dot product of two array<double> columns", "")

  private val cosineInfo = new ExpressionInfo(
    classOf[CosineSim].getName, null, "graft_cosine",
    "graft_cosine(a, b) - cosine similarity of two array<double> columns " +
      "(single fused pass)", "")

  val dotFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression) =
    (FunctionIdentifier("graft_dot"), dotInfo,
      exprs => DotProduct(toDoubleArray(exprs(0)), toDoubleArray(exprs(1))))

  val cosineFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression) =
    (FunctionIdentifier("graft_cosine"), cosineInfo,
      exprs => CosineSim(toDoubleArray(exprs(0)), toDoubleArray(exprs(1))))

  private val hhInfo = new ExpressionInfo(
    classOf[HeavyHitters].getName, null, "graft_heavy_hitters",
    "graft_heavy_hitters(s, capacity, emit) - mergeable Misra-Gries " +
      "heavy-hitters sketch over a string column", "")

  private def hhBuilder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    require(exprs.length == 3,
      "graft_heavy_hitters(s, capacity, emit) takes exactly 3 arguments")
    // capacity/emit must be non-null integer literals: a column reference
    // would throw an internal error from eval(), and a NULL literal an
    // NPE — surface a readable analysis-time message instead
    def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
               name: String): Int = {
      require(e.foldable,
        s"graft_heavy_hitters: $name must be an integer literal, got ${e.sql}")
      e.eval() match {
        case n: Number => n.intValue
        case other => throw new IllegalArgumentException(
          s"graft_heavy_hitters: $name must be a non-null integer literal, got $other")
      }
    }
    HeavyHitters(exprs(0), intLit(exprs(1), "capacity"), intLit(exprs(2), "emit"))
  }

  val heavyHittersFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression) =
    (FunctionIdentifier("graft_heavy_hitters"), hhInfo, hhBuilder)

  /** Imperative registration on an existing session. */
  def register(spark: SparkSession): Unit = {
    Shim.registerFunction(spark, "graft_dot", dotInfo,
      exprs => DotProduct(toDoubleArray(exprs(0)), toDoubleArray(exprs(1))))
    Shim.registerFunction(spark, "graft_cosine", cosineInfo,
      exprs => CosineSim(toDoubleArray(exprs(0)), toDoubleArray(exprs(1))))
    Shim.registerFunction(spark, "graft_heavy_hitters", hhInfo, hhBuilder)
  }
}
