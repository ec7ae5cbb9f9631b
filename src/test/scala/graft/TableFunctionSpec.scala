package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOf, RangeJoin}

/** The SQL table-function surface must be EXACTLY the Scala operators:
  * each TVF builder hands the analyzer the same composed plan, so these
  * differentials would only break if the two surfaces drift.
  */
class TableFunctionSpec extends SparkSpec {
  import spark.implicits._

  private val quotes = Seq(
    ("a", 1L, 10.0), ("a", 5L, 11.0), ("b", 3L, 20.0))
    .toDF("k", "t", "px")
  private val trades = Seq(
    ("a", 2L), ("a", 7L), ("b", 1L), ("c", 4L))
    .toDF("k", "t")

  test("graft_asof_join equals AsOf.asofJoin (backward and forward)") {
    trades.createOrReplaceTempView("tvf_trades")
    quotes.createOrReplaceTempView("tvf_quotes")
    for (dir <- Seq("backward", "forward")) {
      val viaSql = spark.sql(
        s"SELECT * FROM graft_asof_join('tvf_trades', 'tvf_quotes', 'k', 't', 'px', '$dir')")
        .collect().toSet
      val viaApi = (if (dir == "backward") AsOf.asofJoin(trades, quotes, "k", "t", Seq("px"))
        else AsOf.asofJoinForward(trades, quotes, "k", "t", Seq("px")))
        .collect().toSet
      assert(viaSql == viaApi, s"direction=$dir")
    }
  }

  test("graft_point_in_interval equals RangeJoin.pointInInterval") {
    val points = Seq((1L, "2020-01-01 00:10:00"), (2L, "2020-01-02 00:00:00"))
      .toDF("pid", "pts")
    val ivals = Seq((10L, "2020-01-01 00:00:00", "2020-01-01 01:00:00"))
      .toDF("iid", "s", "e")
    points.createOrReplaceTempView("tvf_points")
    ivals.createOrReplaceTempView("tvf_ivals")
    val viaSql = spark.sql(
      "SELECT * FROM graft_point_in_interval('tvf_points', 'pts', 'tvf_ivals', 's', 'e', 3600)")
      .collect().toSet
    val viaApi = RangeJoin.pointInInterval(points, "pts", ivals, "s", "e", 3600L)
      .collect().toSet
    assert(viaSql == viaApi && viaSql.nonEmpty)
  }

  test("bad TVF arguments fail with readable messages") {
    trades.createOrReplaceTempView("tvf_trades")
    quotes.createOrReplaceTempView("tvf_quotes")
    val e1 = intercept[Exception] {
      spark.sql(
        "SELECT * FROM graft_asof_join('tvf_trades','tvf_quotes','k','t','px','sideways')")
    }
    assert(e1.getMessage.contains("direction"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_asof_join('only_one')")
    }
    assert(e2.getMessage.contains("5 or 6"), e2.getMessage)
    // fractional bucketSec must be rejected, not silently truncated
    Seq((1L, "2020-01-01 00:10:00")).toDF("pid", "pts")
      .createOrReplaceTempView("tvf_points_frac")
    Seq((10L, "2020-01-01 00:00:00", "2020-01-01 01:00:00"))
      .toDF("iid", "s", "e").createOrReplaceTempView("tvf_ivals_frac")
    val e3 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_point_in_interval(" +
        "'tvf_points_frac', 'pts', 'tvf_ivals_frac', 's', 'e', 3600.9)")
    }
    assert(e3.getMessage.contains("integer literal"), e3.getMessage)
  }

  test("graft_tx_read equals TxLog.read / readAsOf (snapshot + time travel)") {
    import graft.sources.TxLog
    val t = java.nio.file.Files.createTempDirectory("graft-tvf-tx")
      .resolve("t").toString
    TxLog.overwrite(Seq((1L, "old")).toDF("k", "v"), t)
    TxLog.overwrite(Seq((2L, "new"), (3L, "also")).toDF("k", "v"), t)
    assert(spark.sql(s"SELECT * FROM graft_tx_read('$t')").collect().toSet ==
      TxLog.read(spark, t).collect().toSet)
    assert(spark.sql(s"SELECT * FROM graft_tx_read('$t', 1)").collect().toSet ==
      TxLog.readAsOf(spark, t, 1L).collect().toSet)
    assert(spark.sql(s"SELECT count(*) AS n FROM graft_tx_read('$t', 1)")
      .as[Long].head() == 1L)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_tx_read('$t', 1, 2, 3)")
    }
    assert(e.getMessage.contains("1 or 2"), e.getMessage)
  }

  test("graft_tx_cdf equals TxLog.readChangeFeed") {
    import org.apache.spark.sql.functions.{col, lit}
    import graft.sources.TxLog
    val t = java.nio.file.Files.createTempDirectory("graft-tvf-cdf")
      .resolve("t").toString
    TxLog.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t) // v1
    TxLog.append(Seq((3L, "c")).toDF("k", "v"), t)               // v2
    TxLog.delete(spark, t, col("k") === 1L, changeFeed = true)   // v3
    TxLog.update(spark, t, col("k") === 3L, Seq("v" -> lit("z")),
      changeFeed = true)                                         // v4
    assert(spark.sql(s"SELECT * FROM graft_tx_cdf('$t', 1)").collect().toSet ==
      TxLog.readChangeFeed(spark, t, 1L).collect().toSet)
    // bounded range: only the delete's changes
    assert(spark.sql(s"SELECT * FROM graft_tx_cdf('$t', 2, 3)").collect().toSet ==
      TxLog.readChangeFeed(spark, t, 2L, Some(3L)).collect().toSet)
    assert(spark.sql(
        s"SELECT _change_type, count(*) AS n FROM graft_tx_cdf('$t', 1) GROUP BY 1")
      .as[(String, Long)].collect().toMap ==
      Map("insert" -> 1L, "delete" -> 1L,
        "update_preimage" -> 1L, "update_postimage" -> 1L))
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_tx_cdf('$t')")
    }
    assert(e.getMessage.contains("2 or 3"), e.getMessage)
  }
}
