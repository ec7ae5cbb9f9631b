package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality gate — the check suite a lakehouse runs
  * before publishing a table to the serving layer (the reference
  * hand-rolls ad-hoc validity filters inside its cleaning job,
  * `/root/reference/scripts/spark_jobs/data_cleaning.py:74-98`; this is
  * the reusable, reportable form).
  *
  * Each check yields one row `(check, metric, pass)` with `pass =
  * metric <=` that check's own tolerance (a fraction-valued
  * completeness check and a count-valued range check must not share one
  * bar). Scale shape: all column-level checks fold into ONE conditional
  * aggregate over a single scan regardless of how many there are;
  * uniqueness is one grouped aggregate on the key; referential
  * integrity is one anti join on the child key. Nothing is row-by-row,
  * nothing collects, and a 100-check suite on a 100 TB table still
  * costs one fact scan plus the key-level aggregates.
  */
object Validate {

  sealed trait Check { def name: String; def tolerance: Double }
  /** Fraction of NULLs in `column` (metric = null fraction, 0 on an
    * empty table).
    */
  final case class Completeness(column: String, tolerance: Double = 0.0)
      extends Check {
    val name = s"completeness_$column"
  }
  /** Count of values outside `[lo, hi]` (metric = violation count).
    * `suffix` disambiguates multiple bands on one column (check names
    * must be unique).
    */
  final case class InRange(column: String, lo: Double, hi: Double,
                           tolerance: Double = 0.0,
                           suffix: String = "") extends Check {
    val name = s"range_$column$suffix"
  }

  /** Run `scanChecks` in one aggregate pass over `df`, plus optional
    * key-uniqueness (metric = rows in duplicated key groups) and
    * referential-integrity (metric = distinct orphan child keys against
    * `parent`) checks. NULL child keys are NOT orphans (the SQL foreign
    * key convention — a missing reference is a completeness question,
    * not an integrity one; pair with a [[Completeness]] check to forbid
    * them). Check names must be unique — two bands on one column need
    * distinct names to be two report rows.
    */
  def report(df: DataFrame, scanChecks: Seq[Check],
             uniqueKey: Option[Seq[String]] = None,
             foreignKey: Option[(String, DataFrame, String)] = None,
             uniqueTolerance: Double = 0.0,
             riTolerance: Double = 0.0): DataFrame = {
    require(scanChecks.nonEmpty, "at least one scan check required")
    val names = scanChecks.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate check names: ${names.diff(names.distinct).distinct.mkString(", ")}")
    // empty-table guard: sum() over zero rows is NULL, and a NULL
    // metric gives pass = NULL — a gate that neither passes nor fails.
    // Zero rows have zero nulls and zero violations; coalesce says so.
    val aggs = scanChecks.map {
      case c @ Completeness(col0, _) =>
        coalesce(
          sum(when(col(col0).isNull, 1L).otherwise(0L)).cast("double") /
            count(lit(1)), lit(0.0)).as(c.name)
      case c @ InRange(col0, lo, hi, _, _) =>
        coalesce(sum(when(col(col0) < lo || col(col0) > hi, 1L).otherwise(0L))
          .cast("double"), lit(0.0)).as(c.name)
    }
    // one scan, N metrics → N rows. unpivot takes Columns directly —
    // no SQL-string building, so check/column names never hit a parser.
    val scanReport = df.agg(aggs.head, aggs.tail: _*)
      .unpivot(Array.empty, names.map(col).toArray, "check", "metric")

    val uniqReport = uniqueKey.map { keys =>
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1)
        .agg(coalesce(sum(col("__n")), lit(0L)).cast("double").as("metric"))
        .select(lit(s"uniqueness_${keys.mkString("_")}").as("check"), col("metric"))
    }
    val riReport = foreignKey.map { case (childKey, parent, parentKey) =>
      // parent key re-aliased so fact and dim may share the key NAME
      // (the common star-schema case) without an ambiguous join
      df.select(col(childKey)).filter(col(childKey).isNotNull).distinct()
        .join(parent.select(col(parentKey).as("__vpk")),
          col(childKey) === col("__vpk"), "left_anti")
        .agg(count(lit(1)).cast("double").as("metric"))
        .select(lit(s"ri_$childKey").as("check"), col("metric"))
    }
    // per-row tolerance: each check row compares against ITS bar
    val tol = scanChecks.foldLeft(
      when(col("check").startsWith("uniqueness_"), uniqueTolerance)
        .when(col("check").startsWith("ri_"), riTolerance)
        .otherwise(lit(0.0))) { (acc, c) =>
      when(col("check") === c.name, lit(c.tolerance)).otherwise(acc)
    }
    (Seq(scanReport) ++ uniqReport ++ riReport)
      .reduce(_ unionByName _)
      .withColumn("pass", col("metric") <= tol)
  }
}
