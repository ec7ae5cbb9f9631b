package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Cross-query consistency invariants: independent queries over the same
  * data must agree on derivable facts. Cheap to run, and they catch
  * semantic drift that per-query oracles can't (an oracle mirrors its
  * query's definition; these tie different definitions together).
  */
class InvariantsSpec extends SparkSpec {
  import spark.implicits._

  test("rollup grand total equals the sum of the leaf groups") {
    val rows = Core.defs("q29_rollup")(spark, sfDir)
      .select("flag", "status", "revenue").as[(String, String, Double)].collect()
    val grand = rows.filter(r => r._1 == "ALL" && r._2 == "ALL").map(_._3).sum
    val leaves = rows.filter(r => r._1 != "ALL" && r._2 != "ALL").map(_._3).sum
    assert(math.abs(grand - leaves) < 0.02) // decimal-rounded leaves
  }

  test("pivot row sums equal the per-user event counts") {
    val pivotTotals = Core.defs("q35_pivot")(spark, sfDir)
      .select(col("user_id"),
        (col("click") + col("error") + col("purchase") + col("signup") + col("view")).as("t"))
      .as[(Long, Long)].collect().toMap
    val counts = Tables.events(spark, sfDir).groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    assert(pivotTotals == counts)
  }

  test("semi + anti counts partition the customer set") {
    Core.defs("q31_anti_semi")(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Long]("with_orders") + r.getAs[Long]("without_orders") ==
        r.getAs[Long]("n_cust"))
    }
  }

  test("quartiles are 1..4 and cume_dist ends at 1 per user") {
    val df = Core.defs("q37_rank_funcs")(spark, sfDir)
    val quartiles = df.select("quartile").distinct().as[Int].collect().toSet
    assert(quartiles == Set(1, 2, 3, 4))
    val maxCume = df.groupBy("user_id").agg(max("cume").as("m"))
      .select("m").as[Double].collect()
    maxCume.foreach(m => assert(m == 1.0))
  }

  test("exact dedup groups and fingerprint groups cover all docs") {
    val nDocs = Tables.documents(spark, sfDir).count()
    val d01 = LlmData.defs("d01_exact_dedup")(spark, sfDir)
      .agg(sum("n_dups")).as[Long].head()
    val t04 = LlmData.defs("t04_fingerprint")(spark, sfDir)
      .agg(sum("n_docs")).as[Long].head()
    assert(d01 == nDocs && t04 == nDocs)
  }

  test("split assignment covers every doc exactly once with sane proportions") {
    val split = LlmData.defs("d10_split_assign")(spark, sfDir)
    val n = Tables.documents(spark, sfDir).count()
    assert(split.count() == n)
    val byS = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byS.keySet == Set("train", "val", "test"))
    assert(byS("train") > byS("val") && byS("train") > byS("test"))
  }

  test("market breadth partitions the per-day user counts (q43 vs q39)") {
    val breadth = Core.defs("q43_market_breadth")(spark, sfDir).collect()
    breadth.foreach { r =>
      assert(r.getAs[Long]("bullish") + r.getAs[Long]("bearish") +
        r.getAs[Long]("neutral") == r.getAs[Long]("num_users"))
    }
    // every q39 day (trailing-90-window) must agree with q43's independent
    // per-day rollup; q43 covers all days, so q39 ⊆ q43 regardless of the
    // dataset's time span
    val q39 = Core.defs("q39_market_summary")(spark, sfDir)
      .select("day", "num_users").as[(java.sql.Date, Long)].collect().toMap
    val q43 = breadth.map(r =>
      r.getAs[java.sql.Date]("day") -> r.getAs[Long]("num_users")).toMap
    assert(q39.nonEmpty)
    q39.foreach { case (d, n) => assert(q43.get(d).contains(n), s"day $d: q39=$n q43=${q43.get(d)}") }
  }

  test("weekly OHLC bounds hold and events reconcile with the raw stream (q42)") {
    val ohlc = Core.defs("q42_period_ohlc")(spark, sfDir).collect()
    ohlc.foreach { r =>
      val (o, c, h, l) = (r.getAs[Double]("open"), r.getAs[Double]("close"),
        r.getAs[Double]("high"), r.getAs[Double]("low"))
      assert(l <= o && o <= h && l <= c && c <= h, s"OHLC bounds violated: $r")
    }
    val total = ohlc.map(_.getAs[Long]("n_events")).sum
    assert(total == Tables.events(spark, sfDir).count())
  }

  test("RSI stays in [0,100] and drawdown never goes positive (q44/q46)") {
    val rsi = Core.defs("q44_rsi")(spark, sfDir)
      .agg(min("rsi_14"), max("rsi_14")).as[(Double, Double)].head()
    assert(rsi._1 >= 0.0 && rsi._2 <= 100.0, s"RSI range $rsi")
    val dd = Core.defs("q46_drawdown")(spark, sfDir)
      .agg(max("drawdown_pct")).as[Double].head()
    assert(dd <= 0.0, s"positive drawdown $dd")
  }

  test("MACD histogram is macd minus signal on every row (q45)") {
    val bad = Core.defs("q45_macd")(spark, sfDir)
      .filter(abs(col("macd") - col("macd_signal") - col("macd_hist")) > 1e-3)
      .count()
    assert(bad == 0L)
  }

  test("rolling distinct bounds and cumulative users monotone to the global total") {
    val ev = Tables.events(spark, sfDir)
    val dailyDistinct = ev.groupBy(col("ts").cast("date").as("day"))
      .agg(countDistinct("user_id").as("d1")).as[(java.sql.Date, Long)].collect().toMap
    val rolling = Core.defs("q48_rolling_distinct")(spark, sfDir)
      .as[(java.sql.Date, Long)].collect().toMap
    assert(rolling.keySet == dailyDistinct.keySet)
    val total = ev.select("user_id").distinct().count()
    rolling.foreach { case (d, n) =>
      // trailing-7d count is at least the single day's and at most all users
      assert(n >= dailyDistinct(d) && n <= total, s"day $d n=$n")
    }
    val cum = Core.defs("q49_cumulative_users")(spark, sfDir)
      .orderBy("day").select("cumulative_users").as[Long].collect().toSeq
    assert(cum == cum.sorted, "cumulative users must be non-decreasing")
    assert(cum.last == total, "final cumulative count must equal total distinct users")
  }

  test("LSH and IVF ANN neighbor lists are subsets of plausible candidates (no self, ranked)") {
    Seq("d07_ann_lsh", "d08_ann_ivf").foreach { q =>
      val out = LlmData.defs(q)(spark, sfDir)
        .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect()
      assert(out.nonEmpty, q)
      out.groupBy(_._1).foreach { case (qid, rows) =>
        assert(rows.forall(_._2 != qid), s"$q self-match for $qid")
        assert(rows.map(_._3).sorted.toSeq == (1 to rows.length), s"$q ranks for $qid")
      }
    }
  }
}
