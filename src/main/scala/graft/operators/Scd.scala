package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension maintenance — the dimension-history
  * half of a lakehouse serving layer (the reference's star schema keeps
  * `dim_*` tables current-state only; SCD2 is what a warehouse runs to
  * keep history queryable "as of" any date).
  *
  * Shape: union the open current rows with the day-deduped change rows,
  * then ONE window pass per key closes every version at the day before
  * its successor's effective date. One shuffle on the dimension key, no
  * self-join, no per-row driver loop — at 100 TB of history the cost is
  * a single sort-within-key, the same as any windowed fact query.
  */
object Scd {

  /** Apply `changes` (one attribute observation per (key, effDate)) to
    * `current` (open dimension rows, effective-from `currentFrom`).
    *
    * Both frames must carry the same `attrs` columns. Multiple changes
    * on one (key, day) collapse to the latest by `tieBreak` (descending)
    * first — deterministic regardless of arrival order. Output: key,
    * attrs, `eff_from`/`eff_to` (dates, eff_to null for the open
    * version) and `is_current`.
    */
  def scd2(current: DataFrame, currentFrom: Column,
           changes: DataFrame, changeDate: Column,
           key: String, attrs: Seq[String], tieBreak: Column): DataFrame = {
    // lowercased compare like AsOf/RangeJoin (Spark resolution is
    // case-insensitive by default); __prec is the internal precedence
    // column below — an input column of that name would be silently
    // clobbered by withColumn and then dropped
    val reserved = Set("eff_from", "eff_to", "is_current", "__prec")
    val clash = (current.columns ++ changes.columns)
      .filter(c => reserved.contains(c.toLowerCase(java.util.Locale.ROOT)))
    require(clash.isEmpty,
      s"input has reserved column name(s): ${clash.mkString(", ")}")
    val cur = current.select(
      (col(key) +: attrs.map(col)) :+ currentFrom.cast("date").as("eff_from"): _*)
      .withColumn("__prec", lit(0))
    val chg = Cleaning.dedupLatest(
        changes.withColumn("eff_from", changeDate.cast("date")),
        Seq(key, "eff_from"), Seq(tieBreak.desc))
      .select((col(key) +: attrs.map(col)) :+ col("eff_from"): _*)
      .withColumn("__prec", lit(1))
    // a change landing ON the current row's effective date supersedes it
    // (higher precedence) instead of leaving an inverted zero-day version
    val merged = Cleaning.dedupLatest(cur.unionByName(chg),
      Seq(key, "eff_from"), Seq(col("__prec").desc)).drop("__prec")
    val w = Window.partitionBy(key).orderBy(col("eff_from"))
    merged
      .withColumn("eff_to", date_sub(lead(col("eff_from"), 1).over(w), 1))
      .withColumn("is_current", col("eff_to").isNull)
  }
}
