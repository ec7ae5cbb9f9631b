package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Daily aggregation / correlation / categorization / event-detection
  * operators — the reference's sentiment-analysis surface re-expressed over
  * the generic `events` stream (user_id ~ ticker, ts ~ time, value ~ price,
  * event_type ~ sentiment label).
  *
  * Re-expresses `/root/reference/scripts/spark_jobs/data_transformation.py:243-325`
  * and `/root/reference/scripts/spark_jobs/sentiment_analysis.py`.
  *
  * All aggregations are hash aggregations with map-side partial combine;
  * the daily grain (key, day) is high-cardinality so shuffles stay balanced
  * at 100 TB. Correlations use Spark's distributed `corr` aggregate, never
  * a driver-side collect.
  */
object SentimentOps {

  /** NaN → null, so Spark's corr (NaN on zero variance) matches SQL (NULL). */
  private def nanToNull(c: Column): Column = when(isnan(c), lit(null)).otherwise(c)

  /** Per (user, day) aggregate: count/avg/min/max/stddev of value plus
    * per-label conditional counts and ratios
    * (data_transformation.py:261-282).
    */
  def dailyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(
        count(lit(1)).as("n"),
        // Exact decimal sum / count instead of avg(double): deterministic
        // under any partial-aggregation order (the input is 4-decimal), so
        // downstream correlation/bucketing is reproducible cross-engine.
        sum(col("value").cast("decimal(18,4)")).as("__vsum"),
        min("value").as("v_min"),
        max("value").as("v_max"),
        stddev_samp(col("value")).as("v_sd"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("purchases"),
        sum(when(col("event_type") === "click", 1).otherwise(0)).as("clicks"),
        sum(when(col("event_type") === "error", 1).otherwise(0)).as("errors"))
      .withColumn("v_avg", col("__vsum").cast("double") / col("n"))
      .drop("__vsum")
      .withColumn("purchase_ratio", col("purchases") / col("n"))
      .withColumn("click_ratio", col("clicks") / col("n"))

  /** Exponential-decay recency-weighted mean per user, anchored at the
    * dataset's max timestamp so results are deterministic (the reference
    * anchors at current_timestamp, data_transformation.py:285-304).
    * `halfLifeHours`-style decay: w = exp(-hours_ago / tau).
    */
  def weightedRecency(events: DataFrame, tauHours: Double): DataFrame = {
    val tsUs = unix_micros(col("ts").cast("timestamp"))
    val withAnchor = events
      .select(col("user_id"), col("value"), tsUs.as("ts_us"))
      .crossJoin(broadcast(events.agg(max(tsUs).as("anchor_us"))))
    withAnchor
      .withColumn("w", exp(-((col("anchor_us") - col("ts_us")) / 3.6e9) / tauHours))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n"),
        sum(col("value") * col("w")).as("wsum"),
        sum(col("w")).as("tw"))
      .withColumn("weighted_avg", when(col("tw") > 0.0, col("wsum") / col("tw")).otherwise(0.0))
  }

  /** Daily series with next-day pct change per user: the input for the
    * correlation operators (sentiment_analysis.py:55-70).
    */
  def dailyWithNextChange(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("day")
    val nxt = lead(col("v_avg"), 1).over(w)
    dailyAgg(events)
      .withColumn(
        "chg_next",
        when(nxt.isNotNull && col("v_avg") =!= 0.0,
          (nxt - col("v_avg")) / col("v_avg") * 100.0))
  }

  /** Pearson correlation of the daily signal vs next-day change, per user
    * (sentiment_analysis.py:73-81).
    */
  def corrByKey(daily: DataFrame): DataFrame =
    daily
      .groupBy("user_id")
      .agg(
        sum(when(col("chg_next").isNotNull, 1).otherwise(0)).as("sample_size"),
        nanToNull(corr(col("v_avg"), col("chg_next"))).as("corr_value"),
        nanToNull(corr(col("n"), col("chg_next"))).as("corr_volume"),
        avg("chg_next").as("avg_chg"))

  /** Global correlation aggregate (sentiment_analysis.py:84-89). */
  def corrOverall(daily: DataFrame): DataFrame =
    daily.agg(
      sum(when(col("chg_next").isNotNull, 1).otherwise(0)).as("total_samples"),
      nanToNull(corr(col("v_avg"), col("chg_next"))).as("corr_value"),
      nanToNull(corr(col("n"), col("chg_next"))).as("corr_volume"))

  /** When-chain bucketing of the daily mean value with a deterministic
    * ordering column (sentiment_analysis.py:153-182).
    */
  def categorize(daily: DataFrame): DataFrame = {
    val bucket = when(col("v_avg") < 20.0, "VeryLow")
      .when(col("v_avg") < 40.0, "Low")
      .when(col("v_avg") < 60.0, "Mid")
      .when(col("v_avg") < 80.0, "High")
      .otherwise("VeryHigh")
    val ord = when(col("bucket") === "VeryLow", 1)
      .when(col("bucket") === "Low", 2)
      .when(col("bucket") === "Mid", 3)
      .when(col("bucket") === "High", 4)
      .otherwise(5)
    daily
      .withColumn("bucket", bucket)
      .withColumn("ord", ord)
      .groupBy("bucket", "ord")
      .agg(
        count(lit(1)).as("n_days"),
        avg("chg_next").as("avg_chg"),
        stddev_samp(col("chg_next")).as("sd_chg"))
  }

  /** Threshold event detection: busy days with high intraday range, next-day
    * impact, and a sign-alignment score (sentiment_analysis.py:215-282).
    */
  def detectEvents(daily: DataFrame, minEvents: Int, minIntradayPct: Double): DataFrame = {
    val intraday = when(col("v_avg") =!= 0.0, (col("v_max") - col("v_min")) / col("v_avg") * 100.0)
      .otherwise(0.0)
    daily
      .withColumn("intraday_vol", intraday)
      .filter(col("n") >= minEvents && col("intraday_vol") >= minIntradayPct)
      .withColumn(
        "event_class",
        when(col("chg_next") > 0.0, "Positive")
          .when(col("chg_next") < 0.0, "Negative")
          .otherwise("Flat"))
      .withColumn(
        "alignment",
        (signum(coalesce(col("chg_next"), lit(0.0))) *
          signum(col("intraday_vol"))).cast("int"))
  }

  /** Year/month rollup of the daily series (sentiment_analysis.py:339-348). */
  def monthlyTrends(daily: DataFrame): DataFrame =
    daily
      .groupBy(year(col("day")).as("year"), month(col("day")).as("month"))
      .agg(
        count(lit(1)).as("trading_days"),
        sum("n").as("total_events"),
        avg("v_avg").as("avg_value"),
        avg("chg_next").as("avg_chg"))
}
