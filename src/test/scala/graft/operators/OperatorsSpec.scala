package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("dedupLatest keeps exactly the freshest row per key") {
    val df = Seq(
      (1L, "a", ts("2024-01-01 10:00:00"), 1.0),
      (1L, "a", ts("2024-01-01 11:00:00"), 2.0),
      (1L, "b", ts("2024-01-01 09:00:00"), 3.0),
      (2L, "a", ts("2024-01-01 08:00:00"), 4.0)
    ).toDF("user_id", "event_type", "ts", "value")
    val out = Cleaning.dedupLatest(df, Seq("user_id", "event_type"), Seq(col("ts").desc))
      .select("user_id", "event_type", "value").as[(Long, String, Double)].collect().toSet
    assert(out == Set((1L, "a", 2.0), (1L, "b", 3.0), (2L, "a", 4.0)))
  }

  test("guardedPct returns 0 on zero/null denominator") {
    val df = Seq((10.0, 5.0), (10.0, 0.0)).toDF("num", "den")
    val out = df.select(Cleaning.guardedPct(col("num"), col("den")).as("p"))
      .as[Double].collect().toSeq
    assert(out == Seq(100.0, 0.0))
  }

  test("asofJoin attaches the latest right row at or before each left ts") {
    val clicks = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 101L),
      (2L, ts("2024-01-01 11:00:00"), 200L)
    ).toDF("user_id", "ts", "click_id")
    val purchases = Seq(
      (1L, ts("2024-01-01 11:00:00"), 1L), // after click 100, before 101
      (1L, ts("2024-01-01 12:00:00"), 2L), // equal ts: inclusive, click 101
      (2L, ts("2024-01-01 10:00:00"), 3L), // before any click: null
      (3L, ts("2024-01-01 10:00:00"), 4L) // user with no clicks: null
    ).toDF("user_id", "ts", "purchase_id")
    val out = AsOf.asofJoin(purchases, clicks, "user_id", "ts",
      valueCols = Seq("click_id"))
      .select("purchase_id", "asof_click_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> Some(100L), 2L -> Some(101L), 3L -> None, 4L -> None))
  }

  test("withSma equals the value itself on the first row of a series") {
    val df = Seq((1L, ts("2024-01-01 00:00:00"), 1L, 10.0),
      (1L, ts("2024-01-01 01:00:00"), 2L, 20.0))
      .toDF("user_id", "ts", "event_id", "value")
    val w = Indicators.seriesWindow("user_id", Seq(col("ts"), col("event_id")))
    val out = Indicators.withSma(df, w, "value", Seq(7))
      .orderBy("event_id").select("sma_7").as[Double].collect().toSeq
    assert(out == Seq(10.0, 15.0))
  }

  test("withRsi: all-gains pegs to 100, mixed series matches hand computation") {
    // series 10 -> 12 -> 11: diffs +2, -1; 14-window means: gains (2+0)/2=1,
    // losses (0+1)/2=0.5 -> rs=2 -> rsi = 100 - 100/3
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 10.0),
      (1L, ts("2024-01-01 01:00:00"), 2L, 12.0),
      (1L, ts("2024-01-01 02:00:00"), 3L, 11.0),
      (2L, ts("2024-01-01 00:00:00"), 4L, 1.0),
      (2L, ts("2024-01-01 01:00:00"), 5L, 2.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val w = Indicators.seriesWindow("user_id", Seq(col("ts"), col("event_id")))
    val out = Indicators.withRsi(df, w, "value", 14)
      .select("event_id", "rsi_14").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).isEmpty) // no diff yet
    assert(out(2L).contains(100.0)) // single gain, zero losses
    assert(math.abs(out(3L).get - (100.0 - 100.0 / 3.0)) < 1e-9)
    assert(out(5L).contains(100.0)) // independent series
  }

  test("withMacd matches sliding means and signal on a short series") {
    val df = Seq.tabulate(4)(i =>
      (1L, ts(f"2024-01-01 0$i%02d:00:00"), i.toLong, (i + 1) * 10.0))
      .toDF("user_id", "ts", "event_id", "value")
    val w = Indicators.seriesWindow("user_id", Seq(col("ts"), col("event_id")))
    val out = Indicators.withMacd(df, w, "value", fast = 2, slow = 3, signalP = 2)
      .orderBy("event_id").select("macd", "macd_signal", "macd_hist")
      .as[(Double, Double, Double)].collect().toSeq
    // values 10,20,30,40: fast(2)-means 10,15,25,35; slow(3)-means 10,15,20,30
    // macd 0,0,5,5; signal(2) 0,0,2.5,5; hist 0,0,2.5,0
    assert(out == Seq((0.0, 0.0, 0.0), (0.0, 0.0, 0.0),
      (5.0, 2.5, 2.5), (5.0, 5.0, 0.0)))
  }

  test("withDrawdown tracks the running peak and never goes positive") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 10.0),
      (1L, ts("2024-01-01 01:00:00"), 2L, 8.0),
      (1L, ts("2024-01-01 02:00:00"), 3L, 12.0),
      (1L, ts("2024-01-01 03:00:00"), 4L, 9.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val w = Indicators.seriesWindow("user_id", Seq(col("ts"), col("event_id")))
    val out = Indicators.withDrawdown(df, w, "value")
      .orderBy("event_id").select("peak", "drawdown_pct")
      .as[(Double, Double)].collect().toSeq
    assert(out == Seq((10.0, 0.0), (10.0, -20.0), (12.0, 0.0), (12.0, -25.0)))
  }

  test("withMomentum guards missing lag with 0") {
    val df = Seq((1L, ts("2024-01-01 00:00:00"), 1L, 10.0),
      (1L, ts("2024-01-01 01:00:00"), 2L, 15.0))
      .toDF("user_id", "ts", "event_id", "value")
    val w = Indicators.seriesWindow("user_id", Seq(col("ts"), col("event_id")))
    val out = Indicators.withMomentum(df, w, "value", Seq(1))
      .orderBy("event_id").select("mom_1").as[Double].collect().toSeq
    assert(out == Seq(0.0, 50.0))
  }

  test("mergeCoalesce: primary wins, secondary fills, discrepancy tracked") {
    val a = Seq((1L, Some(10.0)), (2L, None)).toDF("k", "pv")
      .select(col("k"), col("pv").as("pv"))
    val b = Seq((1L, 12.0), (2L, 7.0), (3L, 9.0)).toDF("k", "sv")
    val out = MergeOps.mergeCoalesce(a, b, Seq("k"),
      Map("m" -> (col("pv"), col("sv"))))
      .select("k", "m", "m_discrepancy").as[(Long, Double, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((10.0, 2.0)))
    assert(out(2L) == ((7.0, 0.0)))
    assert(out(3L) == ((9.0, 0.0)))
  }

  test("skyline keeps exactly the non-dominated points, duplicates included") {
    val df = Seq(
      (1L, 10.0, 5.0), // dominated by 4 (higher x, lower y)
      (2L, 20.0, 3.0), // frontier
      (3L, 20.0, 3.0), // duplicate of frontier point -> kept
      (4L, 15.0, 2.0), // frontier
      (5L, 15.0, 4.0), // dominated by 4 (same x, lower y)
      (6L, 25.0, 9.0), // frontier (max x)
      (7L, 5.0, 1.0) // frontier (min y)
    ).toDF("id", "x", "y")
    val out = Skyline.maxMin(df, "x", "y").select("id").as[Long].collect().toSet
    assert(out == Set(2L, 3L, 4L, 6L, 7L))
  }

  test("dailyAgg counts and ratios") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), "purchase", 10.0),
      (1L, ts("2024-01-01 11:00:00"), "click", 20.0),
      (1L, ts("2024-01-01 12:00:00"), "click", 30.0),
      (1L, ts("2024-01-02 10:00:00"), "error", 40.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val out = SentimentOps.dailyAgg(df)
      .select("day", "n", "v_avg", "purchases", "clicks", "purchase_ratio")
      .as[(java.sql.Date, Long, Double, Long, Long, Double)]
      .collect().map(r => r._1.toString -> r).toMap
    val d1 = out("2024-01-01")
    assert(d1._2 == 3 && d1._3 == 20.0 && d1._4 == 1 && d1._5 == 2)
    assert(math.abs(d1._6 - 1.0 / 3.0) < 1e-12)
  }

  test("withStochastic %K/%D: flat-window midpoint, range math, lattice %D mean") {
    val df = Seq((1L, 1, 10.0), (1L, 2, 20.0), (1L, 3, 30.0), (1L, 4, 20.0), (1L, 5, 10.0))
      .toDF("key", "seq", "v")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("key").orderBy("seq")
    val out = Indicators.withStochastic(df, w, "v", period = 3, dPeriod = 2)
      .orderBy("seq").select("stoch_k", "stoch_d").as[(Double, Double)].collect().toSeq
    assert(out == Seq((50.0, 50.0), (100.0, 75.0), (100.0, 100.0), (0.0, 50.0), (0.0, 0.0)))
  }

  test("withObv signs volume by direction and runs an exact cumulative sum") {
    val df = Seq((1L, 1, 10.0, 1L), (1L, 2, 20.0, 2L), (1L, 3, 20.0, 3L), (1L, 4, 15.0, 4L))
      .toDF("key", "seq", "v", "vol")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("key").orderBy("seq")
    val out = Indicators.withObv(df, w, "v", "vol")
      .orderBy("seq").select("obv").as[Long].collect().toSeq
    assert(out == Seq(0L, 2L, 2L, -2L))
  }

  test("detectEvents filters by min events and intraday volatility") {
    val daily = Seq(
      (1L, "2024-01-01", 5L, 10.0, 5.0, 25.0, Some(3.0)), // iv = 200 -> kept
      (1L, "2024-01-02", 5L, 10.0, 9.0, 11.0, Some(-1.0)), // iv = 20 -> dropped
      (1L, "2024-01-03", 2L, 10.0, 0.0, 30.0, None) // n < 4 -> dropped
    ).toDF("user_id", "day", "n", "v_avg", "v_min", "v_max", "chg_next")
    val out = SentimentOps.detectEvents(daily, 4, 100.0)
      .select("day", "event_class", "alignment").as[(String, String, Int)].collect()
    assert(out.toSeq == Seq(("2024-01-01", "Positive", 1)))
  }
}
