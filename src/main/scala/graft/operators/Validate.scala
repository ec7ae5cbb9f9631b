package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality gate — the check suite a lakehouse runs
  * before publishing a table to the serving layer (the reference
  * hand-rolls ad-hoc validity filters inside its cleaning job,
  * `/root/reference/scripts/spark_jobs/data_cleaning.py:74-98`; this is
  * the reusable, reportable form).
  *
  * Each check yields one row `(check, metric, pass)`. Scale shape: all
  * column-level checks (completeness, range) fold into ONE conditional
  * aggregate over a single scan regardless of how many there are;
  * uniqueness is one grouped aggregate on the key; referential
  * integrity is one anti join on the child key. Nothing is row-by-row,
  * nothing collects, and a 100-check suite on a 100 TB table still
  * costs one fact scan plus the key-level aggregates.
  */
object Validate {

  sealed trait Check { def name: String }
  /** Fraction of NULLs in `column` (metric = null fraction). */
  final case class Completeness(column: String) extends Check {
    val name = s"completeness_$column"
  }
  /** Count of values outside `[lo, hi]` (metric = violation count). */
  final case class InRange(column: String, lo: Double, hi: Double) extends Check {
    val name = s"range_$column"
  }

  /** Run `scanChecks` in one aggregate pass over `df`, plus optional
    * key-uniqueness (metric = rows in duplicated key groups) and
    * referential-integrity (metric = distinct orphan child keys against
    * `parent`) checks. `pass` is `metric <= tolerance` (default 0).
    */
  def report(df: DataFrame, scanChecks: Seq[Check],
             uniqueKey: Option[Seq[String]] = None,
             foreignKey: Option[(String, DataFrame, String)] = None,
             tolerance: Double = 0.0): DataFrame = {
    require(scanChecks.nonEmpty, "at least one scan check required")
    val aggs = scanChecks.map {
      case c @ Completeness(col0) =>
        (sum(when(col(col0).isNull, 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as(c.name)
      case c @ InRange(col0, lo, hi) =>
        sum(when(col(col0) < lo || col(col0) > hi, 1L).otherwise(0L))
          .cast("double").as(c.name)
    }
    // one scan, N metrics → N rows via stack (no per-check jobs)
    val stackArgs = scanChecks
      .map(c => s"'${c.name}', ${c.name}").mkString(", ")
    val scanReport = df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${scanChecks.size}, $stackArgs) AS (check, metric)"))

    val uniqReport = uniqueKey.map { keys =>
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1)
        .agg(coalesce(sum(col("__n")), lit(0L)).cast("double").as("metric"))
        .select(lit(s"uniqueness_${keys.mkString("_")}").as("check"), col("metric"))
    }
    val riReport = foreignKey.map { case (childKey, parent, parentKey) =>
      df.select(col(childKey)).distinct()
        .join(parent.select(col(parentKey)),
          col(childKey) === col(parentKey), "left_anti")
        .agg(count(lit(1)).cast("double").as("metric"))
        .select(lit(s"ri_$childKey").as("check"), col("metric"))
    }
    (Seq(scanReport) ++ uniqReport ++ riReport)
      .reduce(_ unionByName _)
      .withColumn("pass", col("metric") <= tolerance)
  }
}
