package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{broadcast, coalesce, col, lit, min, spark_partition_id}

/** Distributed 2-dimensional skyline (Pareto frontier): rows not dominated
  * by any other row, maximizing `xCol` while minimizing `yCol`
  * (p dominates q iff p.x >= q.x, p.y <= q.y, and one inequality strict).
  *
  * Pattern from the skyline-on-Spark-SQL literature (EDBT 2023,
  * "Integration of Skyline Queries into Spark SQL", PAPERS.md): compute a
  * LOCAL skyline per partition with an in-memory sweep — dominated points
  * never leave their executor — then merge the (small) local skylines in a
  * single final pass. Work is O(n log s) per partition, the merge input is
  * bounded by partitions × local-skyline size, and nothing is collected to
  * the driver. This is the documented mapPartitions exception: dominance
  * is a per-partition imperative sweep no relational operator expresses
  * without an O(n²) self-join.
  */
object Skyline {

  /** In-memory skyline sweep: sort by (x desc, y asc), keep a point iff
    * no kept point dominates it (kept frontier is small and sorted).
    */
  private[operators] def localSkyline(rows: Iterator[Row], xi: Int, yi: Int): Iterator[Row] = {
    val sorted = rows.toArray.sortBy(r => (-r.getDouble(xi), r.getDouble(yi)))
    val kept = ArrayBuffer.empty[Row]
    var bestY = Double.PositiveInfinity
    var bestYx = Double.NegativeInfinity
    sorted.foreach { r =>
      val x = r.getDouble(xi)
      val y = r.getDouble(yi)
      // dominated iff some kept point (all have x >= current x) has y <= y
      // with a strict inequality somewhere; the sweep minimum suffices.
      val dominated =
        if (y > bestY) true
        else if (y == bestY) bestYx > x // same y, strictly better x kept
        else false
      if (!dominated) {
        kept += r
        if (y < bestY || (y == bestY && x > bestYx)) { bestY = y; bestYx = x }
      }
    }
    kept.iterator
  }

  /** Two-phase distributed skyline of `df` maximizing `xCol`, minimizing
    * `yCol` (both numeric; cast to double for the sweep comparison).
    *
    * Merge phase is PARALLEL, not a single-task union: on anti-correlated
    * data the frontier is O(n), so funnelling every local-skyline
    * candidate through one partition would make the merge the scale
    * bottleneck. Instead candidates are RANGE-partitioned on `__x`
    * (equal x values land in one partition, so every cross-partition
    * pair differs strictly in x), and each partition prunes against a
    * broadcast per-partition cutoff: a candidate in partition i is
    * dominated by some higher-x partition's point iff its y >= the
    * running min-y over partitions 0..i-1 (x is strictly greater there,
    * so y <= q.y suffices for dominance). After that filter no
    * cross-partition dominance remains and a per-partition sweep
    * finishes the job — the full frontier never sits in one task's
    * memory. The cutoff table is one row per shuffle partition
    * (tiny; its prefix-min window is driver-scale work, and the join
    * broadcasts it).
    *
    * The candidate set is consumed twice (stats + pruned merge), so it
    * is cached and registered with [[graft.CacheRegistry]] — the caller
    * releases it after running the returned frame.
    */
  def maxMin(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val prepped = df
      .withColumn("__x", col(xCol).cast("double"))
      .withColumn("__y", col(yCol).cast("double"))
    val schema = prepped.schema
    val xi = schema.fieldIndex("__x")
    val yi = schema.fieldIndex("__y")
    implicit val enc = Encoders.row(schema)
    val local = prepped.mapPartitions(it => localSkyline(it, xi, yi))
    // range key is __x ALONE: adding a tiebreaker key could split equal-x
    // rows across partitions, breaking the strict-x cross-partition
    // invariant the cutoff pruning relies on
    val ranged = graft.CacheRegistry.track(
      local.repartitionByRange(col("__x").desc)
        .withColumn("__pid", spark_partition_id())
        .cache())
    val statsW = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cutoffs = ranged.groupBy("__pid").agg(min("__y").as("__miny"))
      .withColumn("__cut",
        coalesce(min("__miny").over(statsW), lit(Double.PositiveInfinity)))
      .select("__pid", "__cut")
    val pruned = ranged.join(broadcast(cutoffs), "__pid")
      .filter(col("__y") < col("__cut"))
      .select(schema.fieldNames.toSeq.map(col): _*)
    pruned.mapPartitions(it => localSkyline(it, xi, yi))
      .drop("__x", "__y")
  }
}
