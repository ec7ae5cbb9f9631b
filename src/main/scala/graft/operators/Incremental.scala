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
    * (cast to decimal so sums are exact and order-independent). The
    * stored sum keeps Spark's full `sum(decimal(18,4))` result type,
    * decimal(28,4) — 10 digits of headroom over any single value, which
    * is what makes the state safe to keep folding for years.
    */
  def aggState(df: DataFrame, keys: Seq[String], value: Column): DataFrame = {
    val v = value.cast("decimal(18,4)")
    df.groupBy(keys.map(col): _*).agg(
      count(v).as("n"),
      sum(v).as("sum_v"),
      min(v).as("min_v"),
      max(v).as("max_v"))
  }

  private val sumType = "decimal(28,4)"

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
    val nTotal = coalesce(col("n"), lit(0L)) + coalesce(col("n_d"), lit(0L))
    // sum must stay NULL while n = 0 (a key seen only with NULL values):
    // coalescing it to 0 unconditionally would disagree with a direct
    // recompute, whose sum over all-NULL input is NULL. The sum is kept
    // at aggState's own decimal(28,4) — re-narrowing it to the input
    // scale would overflow long-lived state that a recompute handles.
    val sumTotal = when(nTotal === 0L, lit(null).cast(sumType)).otherwise(
      (coalesce(col("sum_v"), lit(0).cast(sumType)) +
        coalesce(col("sum_v_d"), lit(0).cast(sumType))).cast(sumType))
    state.join(d, keys, "full_outer").select(
      keys.map(col) ++ Seq(
        nTotal.as("n"),
        sumTotal.as("sum_v"),
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

  // ---------------------------------------------------------------------
  // Change-feed (retractable) maintenance
  // ---------------------------------------------------------------------

  /** Retractable per-key state over `value`: count + exact decimal sum
    * ONLY. These are the self-maintainable aggregates — a delete can be
    * absorbed as a negative contribution. min/max deliberately have no
    * place here: retracting the current minimum requires re-scanning the
    * key's surviving rows (the classic incremental-view-maintenance
    * bound), so a view that needs them under deletes must recompute.
    */
  def aggRetractState(df: DataFrame, keys: Seq[String], value: Column): DataFrame = {
    val v = value.cast("decimal(18,4)")
    // `rows` counts every row, `n` only non-NULL values: a key whose
    // values are all NULL exists in a recompute (n = 0, sum NULL), so
    // presence must be decided by rows, not n
    df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("rows"),
      count(v).as("n"),
      sum(v).as("sum_v"))
  }

  /** Turn a row-level change feed (`_change_type` rows as produced by
    * `TxLog.readChangeFeed`) into a SIGNED delta in [[aggRetractState]]
    * shape: inserts and update post-images contribute +1/+value, deletes
    * and update pre-images −1/−value — fold it with [[mergeRetract]] and
    * the maintained view stays EXACTLY equal to a from-scratch
    * recompute of the live table, at a cost ∝ the change volume. An
    * unknown change type fails loudly at the first row — silently
    * skipping one would corrupt the view forever.
    */
  def cdfDelta(feed: DataFrame, keys: Seq[String], value: Column): DataFrame = {
    val v = value.cast("decimal(18,4)")
    val w = when(col("_change_type").isin("insert", "update_postimage"), lit(1))
      .when(col("_change_type").isin("delete", "update_preimage"), lit(-1))
      .otherwise(raise_error(concat(
        lit("cdfDelta: unknown _change_type '"), col("_change_type"), lit("'"))))
      .cast("int")
    feed.withColumn("__w", w)
      .groupBy(keys.map(col): _*).agg(
        sum(col("__w")).cast("long").as("rows"),
        sum(when(v.isNotNull, col("__w")).otherwise(0)).cast("long").as("n"),
        sum(v * col("__w")).as("sum_v"))
  }

  /** Merge a signed delta into retractable state. Full-outer like
    * [[merge]]; a key whose count returns to zero DISAPPEARS from the
    * view (its residual sum is definitionally zero), exactly as a
    * recompute would drop it.
    */
  def mergeRetract(state: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    val d = Seq("rows", "n", "sum_v").foldLeft(delta)((df, c) =>
      df.withColumnRenamed(c, s"${c}_d"))
    val rowsTotal = coalesce(col("rows"), lit(0L)) + coalesce(col("rows_d"), lit(0L))
    val nTotal = coalesce(col("n"), lit(0L)) + coalesce(col("n_d"), lit(0L))
    val sumTotal = when(nTotal === 0L, lit(null).cast(sumType)).otherwise(
      (coalesce(col("sum_v"), lit(0).cast(sumType)) +
        coalesce(col("sum_v_d"), lit(0).cast(sumType))).cast(sumType))
    state.join(d, keys, "full_outer")
      .select(keys.map(col) ++ Seq(rowsTotal.as("rows"),
        nTotal.as("n"), sumTotal.as("sum_v")): _*)
      .filter(col("rows") =!= 0L)
  }

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
    private var lastBatchId: Long = -1L

    /** foreachBatch handler; also usable directly on bounded frames.
      * foreachBatch is at-least-once — after a failure between the fold
      * and the offset commit, the restarted query RE-DELIVERS the same
      * batchId. Folding it twice would double-count permanently, so
      * batchIds at or below the last folded one are skipped. (Bounded
      * callers looping `fold` directly must pass increasing ids.)
      */
    def fold(batch: DataFrame, batchId: Long = Long.MinValue): Unit = synchronized {
      if (batchId != Long.MinValue && batchId <= lastBatchId) return
      lastBatchId = math.max(lastBatchId, batchId)
      val delta = aggState(batch, keys, value)
      val next = state.fold(delta)(st => merge(st, delta, keys))
        .localCheckpoint(true)
      // the superseded checkpoint is freed here, not handed to
      // CacheRegistry: tracking one entry per micro-batch would grow the
      // registry (and retain each old RDD's lineage) without bound on a
      // long-running stream — the caller frees the LIVE checkpoint via
      // close() when done with the folded state
      liveRdd.foreach(_.unpersist(false))
      liveRdd = org.apache.spark.sql.graftshim.Shim.checkpointedRdd(next)
      state = Some(next)
    }

    /** The folded state so far (None before the first batch). */
    def current: Option[DataFrame] = synchronized(state)

    /** Free the live checkpoint; `current` is unusable afterwards. */
    def close(): Unit = synchronized {
      liveRdd.foreach(_.unpersist(false))
      liveRdd = None
      state = None
    }
  }
}
