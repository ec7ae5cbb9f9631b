package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-source merge operators.
  *
  * Re-expresses the reference's source-merge and master-dataset joins
  * (`/root/reference/scripts/spark_jobs/data_transformation.py:79-108,327-392`):
  * full-outer join with coalesce precedence + discrepancy tracking, and
  * multi-way left joins with null-fill.
  *
  * Scale notes: the full-outer merge shuffles both sides once on the join
  * key (order key / (user, day)) — co-partitioned, no broadcast needed for
  * fact-fact. The master join reuses the same (user_id, day) partitioning
  * across all three join stages, so Catalyst plans a single exchange per
  * side and AQE coalesces post-shuffle partitions.
  */
object MergeOps {

  /** Full-outer merge of a primary and secondary source on `keys`:
    * primary values win, secondary fills the gaps, and an absolute
    * discrepancy column records where both disagree
    * (data_transformation.py:79-108).
    *
    * `valuePairs` maps output column name → (primary column, secondary column).
    */
  def mergeCoalesce(primary: DataFrame, secondary: DataFrame, keys: Seq[String],
                    valuePairs: Map[String, (Column, Column)]): DataFrame = {
    val joined = primary.join(secondary, keys, "full_outer")
    valuePairs.foldLeft(joined) { case (d, (name, (p, s))) =>
      d.withColumn(name, coalesce(p, s))
        .withColumn(
          s"${name}_discrepancy",
          // lit(0), not 0.0: keeps decimal inputs decimal (exact money
          // parity) instead of coercing the branch to double.
          when(p.isNotNull && s.isNotNull, abs(p - s)).otherwise(lit(0)))
    }
  }

  /** Left-join `right` onto `left` on `keys` and null-fill the given
    * columns with defaults (data_transformation.py:358-383).
    */
  def leftJoinFill(left: DataFrame, right: DataFrame, keys: Seq[String],
                   fills: Map[String, Any]): DataFrame = {
    val joined = left.join(right, keys, "left")
    fills.foldLeft(joined) { case (d, (c, v)) =>
      d.withColumn(c, coalesce(col(c), lit(v)))
    }
  }

  /** Apply a CDC change batch to a snapshot — the `MERGE INTO ... WHEN
    * MATCHED UPDATE / DELETE, WHEN NOT MATCHED INSERT` of a table-format
    * lakehouse, as two joins over plain frames. The latest change per
    * key wins (`ordering` descending — ties must be broken by a unique
    * column or the result is nondeterministic); a `D` op deletes the
    * key, anything else (including a NULL op) upserts the change row.
    * NULL join keys are matched null-safely (`<=>`), so a NULL-key
    * change replaces a NULL-key snapshot row instead of duplicating it.
    * One shuffle for the per-key latest, one anti join, one union — no
    * table format, no row-at-a-time driver logic.
    *
    * `changes` must carry every snapshot column plus `opCol` (extra
    * columns — change timestamps, sequence numbers for `ordering` — are
    * allowed and dropped from the output).
    */
  def cdcApply(snapshot: DataFrame, changes: DataFrame, keys: Seq[String],
               ordering: Seq[Column], opCol: String,
               deleteOp: String = "D"): DataFrame = {
    require(changes.columns.contains(opCol),
      s"changes is missing the op column '$opCol'")
    val missing = snapshot.columns.filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"changes is missing snapshot column(s): ${missing.mkString(", ")}")
    val latest = Cleaning.dedupLatest(changes, keys, ordering)
    // null-safe anti join: a plain equi-join never matches NULL keys,
    // which would leave the old NULL-key row alongside the new one
    val changedKeys = keys.foldLeft(latest.select(keys.map(col): _*)) {
      (d, k) => d.withColumnRenamed(k, s"__chg_$k")
    }
    val cond = keys.map(k => snapshot(k) <=> changedKeys(s"__chg_$k"))
      .reduce(_ && _)
    snapshot.join(changedKeys, cond, "left_anti")
      // null-safe delete test: a NULL op must upsert, not silently
      // delete (`=!=` yields NULL for NULL ops and the filter drops it)
      .unionByName(latest.filter(!(col(opCol) <=> lit(deleteOp)))
        .select(snapshot.columns.map(col): _*))
  }
}
