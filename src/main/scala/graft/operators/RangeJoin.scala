package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-safe temporal range joins.
  *
  * A naive point-in-interval join (`p.ts BETWEEN i.start AND i.end`) has
  * no equi-key, so Spark plans BroadcastNestedLoopJoin — O(|points| ×
  * |intervals|) comparisons and a broadcast of one whole side; the shape
  * that dies first at 100 TB. This operator buckets time into
  * `bucketSec` cells and turns the range predicate into an equi-join on
  * the cell id: each interval EXPLODES into the cells it covers, each
  * point maps to exactly one cell, and the residual BETWEEN filter runs
  * only within matching cells — Generate + shuffled hash join, both
  * sides partitioned by cell.
  *
  * Each qualifying (point, interval) pair emerges exactly once (the
  * point's single cell appears once in the interval's cell sequence), so
  * no post-join dedup is needed — unlike interval×interval overlap
  * joins, where both sides span cells.
  *
  * Pick `bucketSec` ≈ the typical interval length: fan-out is
  * `len/bucket + 1` cells per interval, while cell population (and the
  * per-cell join cost) shrinks as buckets narrow. The same technique at
  * the day grain backs q48_rolling_distinct.
  */
object RangeJoin {

  /** Exact floor-division cell id on LONG microseconds, via a temp
    * column so the SQL `div` operator (exact integral division) applies:
    * `us - pmod(us, b)` is the exact floor multiple (pmod is
    * non-negative, so this floors for pre-1970 timestamps too). A
    * double-valued `/` would round above 2^53 µs and could mis-bucket
    * boundary-adjacent rows.
    */
  private def withCell(df: DataFrame, src: Column, out: String,
                       bucketUs: Long): DataFrame = {
    val tmp = s"${out}_us"
    df.withColumn(tmp, unix_micros(src.cast("timestamp")))
      .withColumn(out, expr(s"($tmp - pmod($tmp, ${bucketUs}L)) div ${bucketUs}L"))
      .drop(tmp)
  }

  /** Join `points` (timestamp `pointTsCol`) to every row of `intervals`
    * whose `[startCol, endCol]` contains it (inclusive both ends).
    * Output columns: all of `points` then all of `intervals`; the caller
    * keeps the two column sets disjoint.
    */
  def pointInInterval(
      points: DataFrame, pointTsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketSec: Long): DataFrame = {
    require(bucketSec > 0, "bucketSec must be positive")
    // The cell columns are internal plumbing added via withColumn, which
    // silently REPLACES a same-named caller column — corrupting the join
    // keys — so their names are reserved.
    val pReserved = Set("__cell", "__cell_us")
    val iReserved = Set("__cell", "__c0", "__c1", "__c0_us", "__c1_us")
    val pClash = points.columns.filter(pReserved)
    require(pClash.isEmpty,
      s"points has reserved column name(s): ${pClash.mkString(", ")}")
    val iClash = intervals.columns.filter(iReserved)
    require(iClash.isEmpty,
      s"intervals has reserved column name(s): ${iClash.mkString(", ")}")
    val bucketUs = bucketSec * 1000000L
    val p = withCell(points, col(pointTsCol), "__cell", bucketUs)
    // An inverted interval (end < start) contains no points, but
    // sequence(c0, c1) with c1 < c0 would DESCEND and explode spurious
    // cells — drop such rows before the explode.
    val iv = withCell(withCell(intervals.filter(col(startCol) <= col(endCol)),
        col(startCol), "__c0", bucketUs), col(endCol), "__c1", bucketUs)
      .withColumn("__cell", explode(sequence(col("__c0"), col("__c1"))))
      .drop("__c0", "__c1")
    p.join(iv, Seq("__cell"))
      .filter(col(pointTsCol) >= col(startCol) && col(pointTsCol) <= col(endCol))
      .drop("__cell")
  }
}
