package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join (point-in-time join).
  *
  * For each left row, attach the most recent right row with the same key
  * whose timestamp is <= the left row's timestamp — the classic
  * "news/quote as of trade time" financial join the reference approximates
  * with per-day joins (sentiment ↔ next-day price alignment,
  * `/root/reference/scripts/spark_jobs/sentiment_analysis.py:55-67`).
  *
  * Implementation: union both sides tagged with a side marker, then a single
  * window pass per key ordered by (time, side) carrying the last
  * non-null right-side value struct forward (`last(_, ignoreNulls = true)`).
  * Cost: ONE shuffle on the key + a per-key sort — no per-row lookups, no
  * broadcast of the right side, no range explosion. At 100 TB this is the
  * same shape as a sort-merge join and scales with key cardinality.
  *
  * NULL semantics follow SQL comparisons throughout: a NULL key or NULL
  * time on either side never matches.
  */
object AsOf {

  /** As-of join `left` (probe) with `right` (reference series).
    *
    * Requirements: both frames contain `keyCol` and `timeCol`; `right` has
    * at most one row per (key, time) — pre-dedup with
    * [[Cleaning.dedupLatest]] otherwise, or results are nondeterministic.
    *
    * @param valueCols right-side columns to carry (emitted with prefix `asof_`)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
               valueCols: Seq[String]): DataFrame =
    joined(left, right, keyCol, timeCol, valueCols, backward = true)

  /** Forward variant: attach the EARLIEST right row with the same key
    * whose timestamp is >= the left row's (inclusive — a right row at
    * the exact probe time matches). "Next quote after the order", the
    * mirror of [[asofJoin]]'s "latest before". Same cost shape: one
    * shuffle, one per-key window pass.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, keyCol: String,
                      timeCol: String, valueCols: Seq[String]): DataFrame =
    joined(left, right, keyCol, timeCol, valueCols, backward = false)

  private def joined(left: DataFrame, right: DataFrame, keyCol: String,
                     timeCol: String, valueCols: Seq[String],
                     backward: Boolean): DataFrame = {
    val leftCols = left.columns
    // Spark resolves column names case-insensitively by default, so the
    // guards compare lowercased — a left column named "__Side" would
    // otherwise pass the check and then be silently overwritten by
    // withColumn. The emitted asof_<col> names must also be free on the
    // left, or the output would carry two identically-named columns.
    val reserved = Set("__asof_vals", "__side")
    val clash = (leftCols ++ right.columns).filter(c => reserved(c.toLowerCase(java.util.Locale.ROOT)))
    require(clash.isEmpty,
      s"input has reserved column name(s): ${clash.mkString(", ")}")
    val outNames = valueCols.map(c => s"asof_$c".toLowerCase(java.util.Locale.ROOT)).toSet
    val outClash = leftCols.filter(c => outNames(c.toLowerCase(java.util.Locale.ROOT)))
    require(outClash.isEmpty,
      s"left already has output column name(s): ${outClash.mkString(", ")}")
    // All right-side values ride in ONE struct so the carried columns
    // always come from the SAME right row — independent per-column
    // last(ignoreNulls) carries would fill a genuinely-NULL value from
    // a DIFFERENT (older) right row, fabricating a row that never
    // existed. NULL-key / NULL-time right rows can't satisfy a SQL
    // comparison and are dropped up front (partitionBy would otherwise
    // group NULL keys together and match them).
    val taggedRight = right
      .filter(col(timeCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol), col(timeCol),
        struct(valueCols.map(col): _*).as("__asof_vals"))
      .withColumn("__side", lit(0))
    val structType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    val taggedLeft = left
      .select(leftCols.map(col) :+ lit(null).cast(structType).as("__asof_vals"): _*)
      .withColumn("__side", lit(1))

    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    // Both directions run the SAME incremental [unboundedPreceding,
    // current] frame with last(ignoreNulls) — O(n) per key. The forward
    // variant just reverses the sort axis ("earliest at-or-after" ≡
    // "latest at-or-before" on reversed time); a [current,
    // unboundedFollowing] frame would instead plan Spark's
    // UnboundedFollowing window frame, which recomputes the aggregate
    // per row — O(n²) on a hot key. In BOTH orders the right row sorts
    // before the left row at equal time (__side 0 < 1 ascending), so
    // the inclusive match holds. No further tie-break is needed: left
    // rows carry NULL structs that last(ignoreNulls) skips, so their
    // relative order can't change any carried value, and right rows are
    // unique per (key, time) by contract.
    val ord =
      if (backward) Seq(col(timeCol).asc, col("__side").asc)
      else Seq(col(timeCol).desc, col("__side").asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned.withColumn("__asof_vals",
      last(col("__asof_vals"), ignoreNulls = true).over(w))
    // A NULL-time or NULL-key probe matches nothing — without the guard
    // a NULL time sorts to one end of the partition and spuriously sees
    // every right row in its frame, and NULL keys co-partition.
    val guarded = when(col(timeCol).isNotNull && col(keyCol).isNotNull,
      col("__asof_vals"))
    carried
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => guarded.getField(c).as(s"asof_$c")): _*)
  }
}
