package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-cleaning operators.
  *
  * Re-expresses the reference's cleaning pipeline
  * (`/root/reference/scripts/spark_jobs/data_cleaning.py:70-103`):
  * window-based dedup keeping the freshest row per key, null/validity
  * filters, guarded derived columns, and calendar partition columns.
  *
  * All operators are DataFrame → DataFrame so they compose lazily and stay
  * inside one Catalyst plan. The dedup shuffles once on the dedup keys —
  * at 100 TB the key set (ticker/user) is high-cardinality, so partitions
  * stay balanced and the window sort is per-key local.
  */
object Cleaning {

  /** Keep exactly one row per `keys`, the first under `ordering`
    * (reference: row_number over (partition by key order by recency desc)
    * then rn = 1, data_cleaning.py:70-72). `ordering` must be a total
    * order within each key group for deterministic results.
    *
    * Implemented as the k=1 case of the bounded-heap
    * [[graft.plans.TopKPerKey]] operator: the window formulation sorts
    * every key group in full to keep one row; the heap keeps a single
    * best row per key in one streaming pass over the same single
    * shuffle.
    */
  def dedupLatest(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame =
    graft.plans.TopKPerKey(df, keys.map(col), ordering, k = 1)

  /** Drop rows where any of `cols` is null (data_cleaning.py:74-81). */
  def requireNonNull(df: DataFrame, cols: Seq[String]): DataFrame =
    df.filter(cols.map(col(_).isNotNull).reduce(_ && _))

  /** Percentage change `(num / den - 1) * 100`, 0.0 when the denominator
    * is null/zero (guarded division, data_cleaning.py:95-98).
    */
  def guardedPct(num: Column, den: Column): Column =
    when(den.isNotNull && den =!= 0.0, (num - den) / den * 100.0).otherwise(0.0)

  /** Calendar partition columns from a date/timestamp column
    * (data_cleaning.py:100-103). Partitioning output by (year, month) keeps
    * 100 TB writes pruned for time-range queries.
    */
  def withDateParts(df: DataFrame, dateCol: String): DataFrame =
    df.withColumn("year", year(col(dateCol)))
      .withColumn("month", month(col(dateCol)))
      .withColumn("day", dayofmonth(col(dateCol)))
}
