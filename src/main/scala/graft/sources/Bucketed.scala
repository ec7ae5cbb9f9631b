package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located fact-fact joins.
  *
  * At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders,
  * events ⋈ events) is shuffling both sides on the key. Writing both
  * tables bucketed (and sorted) by the join key fixes the partitioning in
  * the storage layout: Spark's scan reports the hash-distribution and the
  * join planner drops both Exchanges (and with sorted buckets, both
  * Sorts) — the join becomes a per-bucket merge with zero network cost.
  * The spec asserts the no-Exchange plan.
  */
object Bucketed {

  /** Write `df` as a bucketed, bucket-sorted managed parquet table. */
  def write(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Equi-join two same-bucketed tables on their bucket key. */
  def join(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
