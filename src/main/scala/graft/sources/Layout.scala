package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) file layout for multi-dimensional data
  * skipping — the parquet-native counterpart of a lakehouse
  * `OPTIMIZE ... ZORDER BY (a, b)`.
  *
  * Range-partitioning a table on ONE column clusters that column's
  * min/max file statistics but leaves every other filter column smeared
  * across all files. Interleaving the bits of two normalized columns
  * into one z-value and range-partitioning + sorting on IT gives every
  * file a tight bounding BOX in (a, b) space: a predicate on either
  * column (or both) now matches only the files whose box intersects it,
  * and parquet row-group min/max stats prune the rest at scan time
  * without reading data pages. At 100 TB the difference is "scan the
  * files a 2-d filter touches" vs "scan everything not clustered on the
  * one sort column".
  *
  * The z-value is a pure codegen'd column expression (shifts and ORs —
  * no UDF), so it costs one projection before the write's range
  * exchange.
  */
object Layout {

  /** Interleave the low 16 bits of `a` (even positions) and `b` (odd
    * positions) into one 32-bit Morton code. Inputs must already be
    * 0..65535; use [[zValue]] for arbitrary numeric columns.
    */
  def interleave16(a: Column, b: Column): Column =
    (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      // bit i of a sits at position i of (a & (1<<i)); << i moves it to
      // 2i. b's bit goes one further to 2i+1.
      acc
        .bitwiseOR(shiftleft(a.cast("long").bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(b.cast("long").bitwiseAND(lit(1L << i)), i + 1))
    }

  /** Morton code of two arbitrary numeric columns, each min/max
    * normalized to a 16-bit grid. `xRange`/`yRange` are the (min, max)
    * the caller computed once over the table (one tiny aggregate job) —
    * passed in, not recomputed, so the expression stays pure. A
    * degenerate range (min == max) maps the whole column to grid cell 0.
    */
  def zValue(x: Column, xRange: (Double, Double),
             y: Column, yRange: (Double, Double)): Column = {
    def norm(c: Column, r: (Double, Double)): Column = {
      val (lo, hi) = r
      if (hi <= lo) lit(0L)
      else {
        val scaled = (c.cast("double") - lit(lo)) / lit(hi - lo) * lit(65535.0)
        // clamp: values outside the sampled range (late-arriving data)
        // land on the grid edge instead of corrupting high bits. NULL
        // coordinates are pinned to cell 0 BEFORE the clamp — least/
        // greatest skip NULLs, so an unguarded NULL would ride through
        // them as 65535 and stretch the top-corner files' bounding
        // boxes across the whole grid.
        val cell = coalesce(floor(scaled).cast("long"), lit(0L))
        greatest(lit(0L), least(lit(65535L), cell))
      }
    }
    interleave16(norm(x, xRange), norm(y, yRange))
  }

  /** N-dimensional Morton code: each column min/max-normalized to a
    * `min(16, 63/n)`-bit grid, bits interleaved round-robin (bit `i` of
    * dimension `d` lands at position `i·n + d`), the whole code fitting
    * a non-negative long. For n = 2 this is exactly [[zValue]]'s 16-bit
    * layout; more dimensions trade per-dimension resolution for
    * dimensions the way every published Z-order implementation does,
    * capped at the 2-d grid's 16 bits (2–3 dims → 16 bits, 4 → 15,
    * 5 → 12, …). Same NULL/out-of-range clamping as the
    * 2-d path. The repeated normalized-cell sub-expressions collapse in
    * codegen's common-subexpression elimination — still a pure
    * projection, no UDF.
    */
  def zValueN(dims: Seq[(Column, (Double, Double))]): Column = {
    val n = dims.size
    require(n >= 1 && n <= 8, s"z-order supports 1..8 dimensions, got $n")
    val bits = math.min(16, 63 / n)
    val maxCell = (1L << bits) - 1
    def norm(c: Column, r: (Double, Double)): Column = {
      val (lo, hi) = r
      if (hi <= lo) lit(0L)
      else {
        val scaled = (c.cast("double") - lit(lo)) / lit(hi - lo) * lit(maxCell.toDouble)
        val cell = coalesce(floor(scaled).cast("long"), lit(0L))
        greatest(lit(0L), least(lit(maxCell), cell))
      }
    }
    dims.zipWithIndex.foldLeft(lit(0L)) { case (acc, ((c, r), d)) =>
      (0 until bits).foldLeft(acc) { (a, i) =>
        a.bitwiseOR(shiftleft(
          norm(c, r).bitwiseAND(lit(1L << i)), i * (n - 1) + d))
      }
    }
  }

  /** [[zValueN]]'s HILBERT counterpart: same per-dimension grid
    * normalization and NULL pinning, but the cells map to their
    * Hilbert-curve position ([[graft.functions.HilbertIndex]], a
    * codegen'd expression) instead of the Morton interleave.
    * Consecutive curve positions are always ADJACENT cells, so range
    * partitions become boxes with strictly better worst-case shapes
    * than Morton's power-of-two jumps — the curve liquid-clustering
    * class systems standardized on.
    */
  def hilbertValueN(dims: Seq[(Column, (Double, Double))]): Column = {
    val n = dims.size
    require(n >= 1 && n <= 8, s"hilbert clustering supports 1..8 dimensions, got $n")
    val bits = math.min(16, 63 / n)
    val maxCell = (1L << bits) - 1
    def norm(c: Column, r: (Double, Double)): Column = {
      val (lo, hi) = r
      if (hi <= lo) lit(0L)
      else {
        val scaled = (c.cast("double") - lit(lo)) / lit(hi - lo) * lit(maxCell.toDouble)
        val cell = coalesce(floor(scaled).cast("long"), lit(0L))
        greatest(lit(0L), least(lit(maxCell), cell))
      }
    }
    org.apache.spark.sql.graftshim.Shim.column(
      graft.functions.HilbertIndex(bits, dims.map { case (c, r) =>
        org.apache.spark.sql.graftshim.Shim.expression(norm(c, r)) }))
  }

  /** [[zOrdered]] over ANY number of columns (the full
    * `OPTIMIZE … ZORDER BY (a, b, c, …)` surface): one aggregate for
    * all ranges, one range exchange on the curve value (`curve` =
    * "morton" | "hilbert"), an in-partition sort. Returns the frame
    * plus each column's (min, max).
    */
  def zOrderedN(df: DataFrame, cols: Seq[String], numFiles: Int,
      curve: String = "morton"): (DataFrame, Seq[(Double, Double)]) = {
    require(numFiles > 0, "numFiles must be positive")
    require(cols.nonEmpty, "z-order needs at least one column")
    require(!df.columns.contains("__z"), "df has reserved column name: __z")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val row = df.agg(aggs.head, aggs.tail: _*).head.toSeq
      .map { case null => 0.0; case v => v.asInstanceOf[Double] }
    val ranges = cols.indices.map(i => (row(2 * i), row(2 * i + 1)))
    val dims = cols.zip(ranges).map { case (c, r) => (col(c), r) }
    val curveValue = curve match {
      case "morton" => zValueN(dims)
      case "hilbert" => hilbertValueN(dims)
      case other => sys.error(
        s"unknown clustering curve '$other' (morton | hilbert)")
    }
    val clustered = df
      .withColumn("__z", curveValue)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
    (clustered, ranges)
  }

  /** `df` re-clustered into `numFiles` partitions z-ordered on (`xCol`,
    * `yCol`): one aggregate for the ranges, one range exchange on the
    * z-value, an in-partition sort (tight row-group AND file stats —
    * each partition becomes a small Morton-curve box in (x, y) space).
    * Composes with any writer; in particular
    * `TxLog.overwrite(Layout.zOrdered(df, x, y, n), table)` gives
    * [[graft.sources.TxLog.readWhere]] two tight per-file ranges to
    * prune on. Returns the frame plus the (min, max) ranges used so
    * callers can derive file-box expectations in specs.
    */
  def zOrdered(df: DataFrame, xCol: String, yCol: String, numFiles: Int)
      : (DataFrame, ((Double, Double), (Double, Double))) = {
    val (clustered, ranges) = zOrderedN(df, Seq(xCol, yCol), numFiles)
    (clustered, (ranges(0), ranges(1)))
  }

  /** Rewrite `df` as `numFiles` parquet files z-ordered on (`xCol`,
    * `yCol`) — [[zOrdered]] followed by the write. Returns the (min,
    * max) ranges used.
    */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
                    numFiles: Int, path: String): ((Double, Double), (Double, Double)) = {
    val (clustered, ranges) = zOrdered(df, xCol, yCol, numFiles)
    clustered.write.mode("overwrite").parquet(path)
    ranges
  }
}
