package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain-mixture construction for pretraining corpora: fill each
  * domain's token budget by taking documents in a deterministic
  * hash order until the budget is spent (the exact-greedy counterpart
  * of rate-based stratified sampling — d13 keeps a fixed FRACTION of
  * rows, this keeps a fixed token BUDGET, which is what a training-mix
  * spec actually states: "25% of tokens from web, 60% from curated").
  *
  * The scale problem is the running sum: the naive formulation is one
  * cumulative-sum window per domain, which Spark executes as ONE TASK
  * per domain — a 40 TB web domain would funnel through a single
  * executor (the same single-partition-window scale-killer d18 avoids
  * by sharding). Here the order key is a hash, and that buys the fix:
  * a hash PREFIX is a contiguous range of the hash order, so slicing
  * by the first `slicePrefixLen` hex chars partitions every domain
  * into ~16^len ordered segments with no sampling and no extra pass —
  * fully deterministic, unlike `repartitionByRange`, whose sampled
  * bounds differ between evaluations. Then the classic two-phase scan:
  *   1. one map-side-combinable aggregate computes each
  *      (domain, slice) segment's weight subtotal — metadata-sized;
  *   2. a window over THAT tiny table turns subtotals into per-segment
  *      prefix offsets, broadcast back;
  *   3. each row's exact global running sum = segment offset + a
  *      segment-local cumulative sum (the only per-row window, bounded
  *      to ~1/16^len of a domain per task).
  * One wide shuffle total (the segment-local window); everything else
  * is tiny. At 100 TB, deepen the prefix to keep segments
  * executor-sized.
  */
object Mixture {

  /** Inclusive running sum of `weight` within each `domain`, rows
    * ordered by (`hashHex`, `tie`), computed by the two-phase
    * hash-sliced scan above (never one task per domain). Adds `__cum`.
    * `hashHex` must be a lowercase hex string (e.g. `md5(...)`); `tie`
    * makes the order total when hashes collide.
    */
  def hashPrefixSum(df: DataFrame, domain: String, hashHex: Column,
      tie: Column, weight: Column, slicePrefixLen: Int = 2): DataFrame = {
    require(slicePrefixLen >= 1 && slicePrefixLen <= 8,
      "slicePrefixLen must be in [1, 8]")
    val reserved = Seq("__h", "__slice", "__w", "__cum", "__psum", "__off")
    val clash = df.columns.map(_.toLowerCase).toSet.intersect(reserved.toSet)
    require(clash.isEmpty, s"input columns clash with reserved names: $clash")
    val keyed = df
      .withColumn("__h", hashHex)
      .withColumn("__slice", substring(hashHex, 1, slicePrefixLen))
      .withColumn("__w", weight.cast("long"))
    val partials = keyed.groupBy(col(domain), col("__slice"))
      .agg(sum(col("__w")).as("__psum"))
    val offW = Window.partitionBy(col(domain)).orderBy(col("__slice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = partials
      .withColumn("__off", coalesce(sum(col("__psum")).over(offW), lit(0L)))
      .select(col(domain), col("__slice"), col("__off"))
    val localW = Window.partitionBy(col(domain), col("__slice"))
      .orderBy(col("__h"), tie)
      .rowsBetween(Window.unboundedPreceding, 0)
    keyed.join(broadcast(offsets), Seq(domain, "__slice"))
      .withColumn("__cum", col("__off") + sum(col("__w")).over(localW))
      .drop("__slice", "__h", "__w")
  }

  /** Exact greedy budget fill: keep each domain's rows in hash order
    * while the inclusive running weight stays within `pct`% of the
    * domain's total weight (`pct` is a per-row integer-percent column,
    * so a when-chain states per-domain mix weights). The threshold
    * compare is integer-only (`cum * 100 <= pct * total`) — no float
    * boundary for two engines to disagree on. Output keeps `__cum`
    * (the running token count, the value a packing stage consumes).
    */
  def budgetFill(df: DataFrame, domain: String, hashHex: Column,
      tie: Column, weight: Column, pct: Column,
      slicePrefixLen: Int = 2): DataFrame = {
    val totals = df.groupBy(col(domain))
      .agg(sum(weight.cast("long")).as("__tot"))
    hashPrefixSum(df, domain, hashHex, tie, weight, slicePrefixLen)
      .join(broadcast(totals), Seq(domain))
      .filter(col("__cum") * 100 <= pct.cast("long") * col("__tot"))
      .drop("__tot")
  }
}
