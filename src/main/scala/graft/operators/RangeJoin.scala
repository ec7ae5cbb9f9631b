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

  /** Interval×interval OVERLAP join: each `left` row `[lStart, lEnd]`
    * matched to every `right` row `[rStart, rEnd]` (same `keys` values)
    * whose interval intersects it (inclusive ends: `lStart <= rEnd &&
    * rStart <= lEnd`).
    *
    * Both sides explode into the time cells they cover and equi-join on
    * `keys :+ cell` — so unlike [[pointInInterval]] an overlapping pair
    * meets in EVERY shared cell. Rather than a `distinct` over the join
    * output (a second full shuffle), each pair is emitted exactly once by
    * the standard cell-ownership rule: keep the match only in the cell
    * containing `greatest(lStart, rStart)` — the first shared cell, which
    * both sides' explosions are guaranteed to include. Dedup becomes a
    * codegen'd filter inside the join stage; nothing shuffles twice.
    *
    * Output columns: all of `left` then all of `right` minus the join
    * keys (kept once); the caller keeps the remaining sets disjoint.
    */
  def intervalOverlap(
      left: DataFrame, lStartCol: String, lEndCol: String,
      right: DataFrame, rStartCol: String, rEndCol: String,
      keys: Seq[String], bucketSec: Long): DataFrame = {
    require(bucketSec > 0, "bucketSec must be positive")
    // ONE reserved set checked against BOTH sides: the two inputs meet in
    // a join, so a left column named __rs_us (the right side's internal)
    // would survive its own side's plumbing and then collide — ambiguous
    // reference in the owner-cell expression, or a user column dropped.
    val reserved = Set("__cell",
      "__l0", "__l1", "__l0_us", "__l1_us", "__ls_us",
      "__r0", "__r1", "__r0_us", "__r1_us", "__rs_us")
    val lClash = left.columns.filter(reserved)
    require(lClash.isEmpty,
      s"left has reserved column name(s): ${lClash.mkString(", ")}")
    val rClash = right.columns.filter(reserved)
    require(rClash.isEmpty,
      s"right has reserved column name(s): ${rClash.mkString(", ")}")
    val bucketUs = bucketSec * 1000000L
    // Inverted intervals (end < start) match nothing; drop them before
    // sequence() would descend (same guard as pointInInterval).
    val l = withCell(withCell(
        left.filter(col(lStartCol) <= col(lEndCol))
          .withColumn("__ls_us", unix_micros(col(lStartCol).cast("timestamp"))),
        col(lStartCol), "__l0", bucketUs), col(lEndCol), "__l1", bucketUs)
      .withColumn("__cell", explode(sequence(col("__l0"), col("__l1"))))
      .drop("__l0", "__l1")
    val r = withCell(withCell(
        right.filter(col(rStartCol) <= col(rEndCol))
          .withColumn("__rs_us", unix_micros(col(rStartCol).cast("timestamp"))),
        col(rStartCol), "__r0", bucketUs), col(rEndCol), "__r1", bucketUs)
      .withColumn("__cell", explode(sequence(col("__r0"), col("__r1"))))
      .drop("__r0", "__r1")
    val ownerCell = expr(
      s"(greatest(__ls_us, __rs_us) - pmod(greatest(__ls_us, __rs_us), ${bucketUs}L)) div ${bucketUs}L")
    l.join(r, (keys :+ "__cell").toSeq)
      .filter(col(lStartCol) <= col(rEndCol) && col(rStartCol) <= col(lEndCol))
      .filter(col("__cell") === ownerCell)
      .drop("__cell", "__ls_us", "__rs_us")
  }
}
