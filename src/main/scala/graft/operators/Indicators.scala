package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Technical-indicator operators: rolling means, Bollinger bands,
  * lag momentum, rolling volatility, relative volume.
  *
  * Re-expresses `/root/reference/scripts/spark_jobs/data_transformation.py:162-228`.
  *
  * Every indicator is a window function partitioned by the series key and
  * ordered by event time: one shuffle on the key, then per-partition sorted
  * scans — the shape that scales linearly with executors when the key is
  * high-cardinality (tickers/users). No global windows.
  */
object Indicators {

  /** Rows-frame window over the series: partition by key, order by time. */
  def seriesWindow(keyCol: String, ordering: Seq[Column]): WindowSpec =
    Window.partitionBy(col(keyCol)).orderBy(ordering: _*)

  /** Simple moving averages over trailing `period` rows (inclusive),
    * one output column per period named `sma_<p>` (data_transformation.py:171-174).
    */
  def withSma(df: DataFrame, w: WindowSpec, valueCol: String, periods: Seq[Int]): DataFrame =
    periods.foldLeft(df) { (d, p) =>
      d.withColumn(s"sma_$p", avg(col(valueCol)).over(w.rowsBetween(-(p - 1), 0)))
    }

  /** Bollinger bands: rolling mean ± `k` rolling sample stddevs over
    * `period` rows (data_transformation.py:181-184). stddev of a single
    * row is null, so the first row's bands are null — matching SQL.
    */
  def withBollinger(df: DataFrame, w: WindowSpec, valueCol: String,
                    period: Int, k: Double): DataFrame = {
    val wp = w.rowsBetween(-(period - 1), 0)
    df.withColumn("bb_mid", avg(col(valueCol)).over(wp))
      .withColumn("bb_sd", stddev_samp(col(valueCol)).over(wp))
      .withColumn("bb_up", col("bb_mid") + lit(k) * col("bb_sd"))
      .withColumn("bb_lo", col("bb_mid") - lit(k) * col("bb_sd"))
  }

  /** Lag-based momentum: pct change vs the value `lag` rows back, 0.0 when
    * the lagged value is missing or zero (data_transformation.py:194-217).
    * Output columns `mom_<lag>`.
    */
  def withMomentum(df: DataFrame, w: WindowSpec, valueCol: String, lags: Seq[Int]): DataFrame =
    lags.foldLeft(df) { (d, l) =>
      val prev = lag(col(valueCol), l).over(w)
      d.withColumn(
        s"mom_$l",
        when(prev.isNotNull && prev =!= 0.0, (col(valueCol) - prev) / prev * 100.0)
          .otherwise(0.0))
    }

  /** Rolling volatility: sample stddev of the 1-row pct change over
    * `period` rows; plus relative value vs the rolling mean
    * (data_transformation.py:220-228). Null pct changes (series head) are
    * ignored by stddev, matching SQL semantics.
    */
  def withVolatility(df: DataFrame, w: WindowSpec, valueCol: String, period: Int): DataFrame = {
    val prev = lag(col(valueCol), 1).over(w)
    val pct = when(prev.isNotNull && prev =!= 0.0, (col(valueCol) - prev) / prev * 100.0)
    val wp = w.rowsBetween(-(period - 1), 0)
    val rollAvg = avg(col(valueCol)).over(wp)
    df.withColumn("__pct", pct)
      .withColumn(s"vol_$period", stddev_samp(col("__pct")).over(wp))
      .withColumn(
        "rel_value",
        when(rollAvg > 0.0, col(valueCol) / rollAvg).otherwise(1.0))
      .drop("__pct")
  }

  /** Forward values via lead() at each horizon with guarded pct change,
    * null when the future value is missing (sentiment_analysis.py:138-150).
    * Output columns `chg_<h>`.
    */
  def withLeadHorizons(df: DataFrame, w: WindowSpec, valueCol: String, horizons: Seq[Int]): DataFrame =
    horizons.foldLeft(df) { (d, h) =>
      val nxt = lead(col(valueCol), h).over(w)
      d.withColumn(
        s"chg_$h",
        when(nxt.isNotNull && col(valueCol) =!= 0.0,
          (nxt - col(valueCol)) / col(valueCol) * 100.0))
    }

  /** Cutler's RSI over trailing `period` rows: 100 - 100/(1 + avgGain /
    * avgLoss), with simple window means of gains/losses (the window-mean
    * formulation, consistent with the reference's window-mean "EMA"
    * approximation; Wilder smoothing is a recursive EWMA no finite SQL
    * window expresses). Gains/losses are 4-decimal-lattice diffs, so they
    * are cast to DECIMAL before the window sum — exact, order-independent,
    * cross-engine deterministic; only the final ratio runs in double.
    * First row of each series has no diff → NULL (ignored by the means).
    * RSI pegs to 100 when the loss mean is 0 and is NULL until a diff
    * exists. Output column `rsi_<period>`.
    */
  def withRsi(df: DataFrame, w: WindowSpec, valueCol: String, period: Int): DataFrame = {
    val prev = lag(col(valueCol), 1).over(w)
    val diff = col(valueCol) - prev
    val gain = when(prev.isNull, lit(null)).when(diff > 0.0, diff).otherwise(0.0)
    val loss = when(prev.isNull, lit(null)).when(diff < 0.0, -diff).otherwise(0.0)
    val wp = w.rowsBetween(-(period - 1), 0)
    def decAvg(c: Column): Column =
      sum(c.cast("decimal(18,4)")).over(wp).cast("double") / count(c).over(wp)
    val (g, l) = (decAvg(gain), decAvg(loss))
    df.withColumn(
      s"rsi_$period",
      when(count(gain).over(wp) === 0, lit(null))
        .when(l === 0.0, 100.0)
        .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + g / l)))
  }

  /** MACD in the reference's window-mean EMA approximation
    * (data_transformation.py:176-178 defines ema_12/ema_26 as the 20-/50-
    * row window means): macd = mean_fast - mean_slow, signal = `signalP`-
    * row mean of macd, histogram = macd - signal. The fast/slow means are
    * exact decimal-sum/count; macd is then pinned to the 4-decimal lattice
    * (same shared-nudge rounding as every emitted double) so the signal
    * mean can run in exact DECIMAL too — fully order-independent, no
    * engine-native double window aggregation anywhere. Output columns:
    * macd, macd_signal, macd_hist (lattice doubles).
    */
  def withMacd(df: DataFrame, w: WindowSpec, valueCol: String,
               fast: Int, slow: Int, signalP: Int): DataFrame = {
    val vDec = col(valueCol).cast("decimal(18,4)")
    def decMean(p: Int): Column = {
      val wp = w.rowsBetween(-(p - 1), 0)
      sum(vDec).over(wp).cast("double") / count(vDec).over(wp)
    }
    val macd4 = round(decMean(fast) - decMean(slow) + 1e-7, 4)
    val ws = w.rowsBetween(-(signalP - 1), 0)
    df.withColumn("macd", macd4)
      .withColumn("macd_signal",
        round(sum(col("macd").cast("decimal(18,4)")).over(ws).cast("double") /
          count(col("macd")).over(ws) + 1e-7, 4))
      .withColumn("macd_hist", round(col("macd") - col("macd_signal") + 1e-7, 4))
  }

  /** Donchian channel, Williams %R, and CCI over the trailing `period`
    * rows — the channel/oscillator family, under the same cross-engine
    * conventions as [[withStochastic]]/[[withMacd]]: order-independent
    * window min/max, exact DECIMAL means, every emitted double pinned
    * to the 4-decimal lattice with the shared nudge. Flat windows:
    * %R pegs to −50 (the midpoint, mirroring stochastic's 50), CCI to 0
    * (no deviation, no signal). CCI is the standard Lambert form:
    * (v − SMA) / (0.015 · mean |v − SMA|), with the SMA lattice-pinned
    * FIRST so the absolute deviations (and their mean) are exact
    * decimal arithmetic on both engines. Output columns: donch_lo,
    * donch_hi, donch_mid, will_r, cci.
    */
  def withChannels(df: DataFrame, w: WindowSpec, valueCol: String,
                   period: Int): DataFrame = {
    val wp = w.rowsBetween(-(period - 1), 0)
    val v = col(valueCol)
    val lo = min(v).over(wp)
    val hi = max(v).over(wp)
    val sma4 = round(
      sum(v.cast("decimal(18,4)")).over(wp).cast("double") /
        count(v).over(wp) + 1e-7, 4)
    val out = df
      .withColumn("donch_lo", round(lo + 1e-7, 4))
      .withColumn("donch_hi", round(hi + 1e-7, 4))
      .withColumn("donch_mid", round((hi + lo) / 2.0 + 1e-7, 4))
      .withColumn("will_r", round(
        when(hi =!= lo, (hi - v) / (hi - lo) * -100.0)
          .otherwise(-50.0) + 1e-7, 4))
      .withColumn("__dev4", round(abs(v - sma4) + 1e-7, 4))
    val md4 = round(
      sum(col("__dev4").cast("decimal(18,4)")).over(wp).cast("double") /
        count(col("__dev4")).over(wp) + 1e-7, 4)
    out.withColumn("cci", round(
        when(md4 =!= 0.0, (v - sma4) / (lit(0.015) * md4))
          .otherwise(0.0) + 1e-7, 4))
      .drop("__dev4")
  }

  /** Stochastic oscillator: %K = (value − min_p)/(max_p − min_p)·100 over
    * trailing `period` rows, %D = `dPeriod`-row mean of %K. min/max are
    * order-independent (exact cross-engine parity); %K is pinned to the
    * 4-decimal lattice so the %D mean can run in exact DECIMAL — the same
    * convention as [[withMacd]]'s signal line. A flat window (max = min,
    * including every series head of length 1) pegs %K to the 50.0
    * midpoint. Output columns `stoch_k`, `stoch_d` (lattice doubles).
    */
  def withStochastic(df: DataFrame, w: WindowSpec, valueCol: String,
                     period: Int, dPeriod: Int): DataFrame = {
    val wp = w.rowsBetween(-(period - 1), 0)
    val lo = min(col(valueCol)).over(wp)
    val hi = max(col(valueCol)).over(wp)
    val k4 = round(
      when(hi =!= lo, (col(valueCol) - lo) / (hi - lo) * 100.0).otherwise(50.0) + 1e-7, 4)
    val wd = w.rowsBetween(-(dPeriod - 1), 0)
    df.withColumn("stoch_k", k4)
      .withColumn("stoch_d",
        round(sum(col("stoch_k").cast("decimal(18,4)")).over(wd).cast("double") /
          count(col("stoch_k")).over(wd) + 1e-7, 4))
  }

  /** On-balance volume: running sum of `volCol` signed by the direction of
    * `valueCol` vs the previous row (+1 up, −1 down, 0 flat/head). With an
    * integral volume the running sum is exact in any engine, and the
    * direction is a comparison, not arithmetic — parity by construction.
    * Output column `obv`.
    */
  def withObv(df: DataFrame, w: WindowSpec, valueCol: String, volCol: String): DataFrame = {
    val prev = lag(col(valueCol), 1).over(w)
    val dir = when(prev.isNull, 0)
      .when(col(valueCol) > prev, 1)
      .when(col(valueCol) < prev, -1)
      .otherwise(0)
    df.withColumn("obv",
      sum((dir * col(volCol)).cast("long"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Running-peak drawdown: peak = cumulative max of the series, drawdown
    * = pct below peak (≤ 0). max() is order-independent, so parity is
    * exact by construction. Output columns `peak`, `drawdown_pct`.
    */
  def withDrawdown(df: DataFrame, w: WindowSpec, valueCol: String): DataFrame = {
    val peak = max(col(valueCol)).over(w.rowsBetween(Window.unboundedPreceding, 0))
    df.withColumn("peak", peak)
      .withColumn(
        "drawdown_pct",
        when(col("peak") > 0.0, (col(valueCol) - col("peak")) / col("peak") * 100.0)
          .otherwise(0.0))
  }
}
