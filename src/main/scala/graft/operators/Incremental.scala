package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a per-key aggregate STATE
  * table and fold each new batch (a day's partition, a backfill, a
  * late-data correction) into it with a merge — never re-scanning
  * history. The reason this is first-class: at 100 TB the daily rollup
  * the reference recomputes from scratch
  * (`/root/reference/scripts/spark_jobs/data_transformation.py:261-282`
  * runs over the full table every DAG run) costs a full-table scan per
  * day, while state+delta costs one scan of the DELTA plus a join
  * against state — the same algebra Structured Streaming's stateful
  * aggregation applies, here in replayable batch form.
  *
  * Only mergeable aggregates are kept in state: count, decimal sum
  * (order-independent, exact), min, max. Averages are DERIVED at read
  * time (`sum/n`), never stored — a stored average can't absorb a
  * delta.
  */
object Incremental {

  val stateCols: Seq[String] = Seq("n", "sum_v", "min_v", "max_v")

  /** Aggregate `df` into per-`keys` mergeable state over `value`
    * (cast to decimal so sums are exact and order-independent).
    */
  def aggState(df: DataFrame, keys: Seq[String], value: Column): DataFrame = {
    val v = value.cast("decimal(18,4)")
    df.groupBy(keys.map(col): _*).agg(
      count(v).as("n"),
      sum(v).as("sum_v"),
      min(v).as("min_v"),
      max(v).as("max_v"))
  }

  /** Merge two state tables (same keys + stateCols). Full-outer on the
    * keys — a delta may contain brand-new keys and misses most old ones;
    * `least`/`greatest` skip nulls, counts and sums treat absent as
    * zero. Commutative and associative, so batches can land in any
    * order and partial merges can be re-merged.
    */
  def merge(state: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    require(stateCols.forall(state.columns.contains) &&
      stateCols.forall(delta.columns.contains),
      s"both sides must carry state columns ${stateCols.mkString(", ")}")
    val d = stateCols.foldLeft(delta)((df, c) => df.withColumnRenamed(c, s"${c}_d"))
    state.join(d, keys, "full_outer").select(
      keys.map(col) ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("n_d"), lit(0L))).as("n"),
        (coalesce(col("sum_v"), lit(0).cast("decimal(18,4)")) +
          coalesce(col("sum_v_d"), lit(0).cast("decimal(18,4)")))
          .cast("decimal(18,4)").as("sum_v"),
        least(col("min_v"), col("min_v_d")).as("min_v"),
        greatest(col("max_v"), col("max_v_d")).as("max_v")): _*)
  }

  /** Read-time view over a state table: derive the exact average from
    * the decimal sum and count (bit-identical on any engine, unlike a
    * stored double average).
    */
  def withAvg(state: DataFrame): DataFrame =
    state.withColumn("avg_v",
      col("sum_v").cast("double") / col("n"))

  /** Streaming sink half of the same algebra: fold each micro-batch into
    * the running state via `foreachBatch` (`folder.fold` is the batch
    * handler). Because [[merge]] is commutative/associative and batches
    * are disjoint slices of the input, the folded state after any prefix
    * of batches EQUALS a one-shot [[aggState]] over those batches' rows
    * — the property the spec asserts. Each fold `localCheckpoint`s the
    * new state: without it the plan stacks one join per micro-batch and
    * the job grows unboundedly; with it each fold starts from
    * materialized rows (the previous checkpoint is freed, the live one
    * is registered with CacheRegistry for release by the caller).
    */
  final class Folder(keys: Seq[String], value: Column) {
    private var state: Option[DataFrame] = None
    private var liveRdd: Option[org.apache.spark.rdd.RDD[_]] = None

    /** foreachBatch handler; also usable directly on bounded frames. */
    def fold(batch: DataFrame, batchId: Long = 0L): Unit = synchronized {
      val delta = aggState(batch, keys, value)
      val next = state.fold(delta)(st => merge(st, delta, keys))
        .localCheckpoint(true)
      liveRdd.foreach(_.unpersist(false))
      liveRdd = org.apache.spark.sql.graftshim.Shim.checkpointedRdd(next)
      liveRdd.foreach(
        graft.CacheRegistry.trackRdd(_, next.sparkSession))
      state = Some(next)
    }

    /** The folded state so far (None before the first batch). */
    def current: Option[DataFrame] = synchronized(state)
  }
}
