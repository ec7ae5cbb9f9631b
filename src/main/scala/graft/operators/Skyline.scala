package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col

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
    val merged = local.repartition(1).mapPartitions(it => localSkyline(it, xi, yi))
    merged.drop("__x", "__y")
  }
}
