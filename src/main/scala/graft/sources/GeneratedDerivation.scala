package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.functions
import org.apache.spark.sql.types._

/** Predicate derivation for GENERATED columns (the Delta
  * `OptimizeGeneratedColumn` capability, re-derived from its published
  * semantics): a table partitioned by a DERIVED column (`o_year =
  * year(o_orderdate)`) is almost always queried by the RAW source
  * column (`WHERE o_orderdate BETWEEN …`) — the reference's own views
  * filter raw `trade_date` over year/month layouts
  * (reference sql/hive_schemas.sql:236-251). Without derivation such a
  * query scans every partition; with it, a filter on the source column
  * yields an implied filter on the generated column, and partition
  * pruning fires.
  *
  * Soundness model: for a derivation to widen a source range into a
  * generated-column range, the generating expression must be
  * NONDECREASING in its source ([[Monotone]]): `src ∈ [lo, hi] ⇒ g ∈
  * [f(lo), f(hi)]`. Cyclic extractions (`month`, `day`, `hour`) are
  * only order-preserving INSIDE one enclosing period, so they derive
  * range bounds only when both endpoints share that period
  * ([[SamePeriod]]); equality/IN always derive (pointwise application
  * needs no monotonicity). Derived values are computed by EVALUATING
  * the declared expression itself against the literal — never by
  * re-implementing its semantics — so the implied predicate is exactly
  * what the write path stamped into the column. Any failure to parse,
  * classify, or evaluate derives NOTHING (the scan stays correct,
  * merely unpruned).
  */
private[graft] object GeneratedDerivation {

  sealed trait Shape

  /** The expression is nondecreasing in its source column: range
    * bounds map through endpoint-wise.
    */
  case object Monotone extends Shape

  /** The expression is order-preserving only within one enclosing
    * calendar period (`fmt` renders that period): range bounds map
    * through only when both endpoints render the same period.
    */
  final case class SamePeriod(fmt: String) extends Shape

  /** `date_format` patterns that render nondecreasing strings: each is
    * a big-endian calendar prefix, so lexicographic order follows
    * chronological order.
    */
  private val monotoneFormats =
    Set("yyyy", "yyyy-MM", "yyyy-MM-dd", "yyyy-MM-dd HH")

  /** Numeric cast targets wide enough that every calendar extraction
    * (year ≤ 9999, month/day/hour) fits without wrap — a wrapping cast
    * would break the order the range derivation relies on.
    */
  private def wideEnough(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | DoubleType => true
    case d: DecimalType => d.precision - d.scale >= 4
    case _ => false
  }

  /** Classify `exprSql` → (source column name, shape), or None when the
    * expression is not a supported single-source derivation.
    */
  def classify(spark: SparkSession, exprSql: String): Option[(String, Shape)] = {
    val parsed =
      try spark.sessionState.sqlParser.parseExpression(exprSql)
      catch { case _: Exception => return None }
    classifyExpr(parsed)
  }

  private def attr(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.name)
    case _ => None
  }

  private def classifyExpr(e: Expression): Option[(String, Shape)] = e match {
    case f: UnresolvedFunction =>
      val name = f.nameParts.map(_.toLowerCase).mkString(".")
      (name, f.arguments) match {
        case ("year", Seq(a)) => attr(a).map(_ -> Monotone)
        case ("to_date", Seq(a)) => attr(a).map(_ -> Monotone)
        case ("date_trunc", Seq(Literal(_, _), a)) => attr(a).map(_ -> Monotone)
        case ("trunc", Seq(a, Literal(_, _))) => attr(a).map(_ -> Monotone)
        case ("date_format", Seq(a, Literal(fmt, StringType)))
            if monotoneFormats(String.valueOf(fmt)) =>
          attr(a).map(_ -> Monotone)
        case ("substring" | "substr", Seq(a, Literal(pos, _), Literal(_, _)))
            if pos == 0 || pos == 1 =>
          attr(a).map(_ -> Monotone)
        case ("month", Seq(a)) => attr(a).map(_ -> SamePeriod("yyyy"))
        case ("day" | "dayofmonth", Seq(a)) =>
          attr(a).map(_ -> SamePeriod("yyyy-MM"))
        case ("hour", Seq(a)) => attr(a).map(_ -> SamePeriod("yyyy-MM-dd"))
        case _ => None
      }
    case c: Cast =>
      c.child match {
        // CAST(ts AS DATE): day truncation, nondecreasing
        case a: UnresolvedAttribute if c.dataType == DateType =>
          Some(a.name -> Monotone)
        // a wide-enough numeric cast of a classified child keeps order
        // (e.g. the canonical "CAST(year(d) AS INT)")
        case child if wideEnough(c.dataType) => classifyExpr(child)
        case _ => None
      }
    case _ => None
  }

  /** Evaluate the generated expression over each source value (a
    * one-row-per-value local relation — the expression itself computes
    * the derived literal, so the implied predicate can never drift
    * from write-path semantics). None on any failure or a null
    * derivation: the caller then derives nothing.
    */
  def derive(spark: SparkSession, exprSql: String, src: String,
      srcType: DataType, vs: Seq[Any]): Option[Seq[Any]] = {
    try {
      val df = spark.createDataFrame(
        vs.map(v => Row(v)).asJava,
        StructType(Seq(StructField(src, srcType, nullable = true))))
      val out = df.select(functions.expr(exprSql)).collect().map(_.get(0))
      if (out.contains(null)) None else Some(out.toIndexedSeq)
    } catch { case _: Exception => None }
  }

  /** Do `lo` and `hi` fall in the same enclosing period (rendered by
    * `fmt`)? False on any evaluation failure — never guess.
    */
  def samePeriod(spark: SparkSession, fmt: String, src: String,
      srcType: DataType, lo: Any, hi: Any): Boolean = {
    derive(spark, s"date_format(`$src`, '$fmt')", src, srcType,
      Seq(lo, hi)) match {
      case Some(Seq(a, b)) => a == b
      case _ => false
    }
  }
}
