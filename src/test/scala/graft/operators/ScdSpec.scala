package graft.operators

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def run(cur: Seq[(Long, Double)],
                  chg: Seq[(Long, Double, String, Long)]) =
    Scd.scd2(
      cur.toDF("k", "v"), lit("2020-01-01"),
      chg.toDF("k", "v", "d", "seq"), col("d"),
      key = "k", attrs = Seq("v"), tieBreak = col("seq"))
      .select("k", "v", "eff_from", "eff_to", "is_current")
      .as[(Long, Double, Date, Option[Date], Boolean)]
      .collect().toSeq.sortBy(r => (r._1, r._3.toString))

  test("versions chain: each closes the day before its successor") {
    val got = run(
      cur = Seq((1L, 10.0)),
      chg = Seq((1L, 20.0, "2020-03-01", 1L), (1L, 30.0, "2020-06-15", 2L)))
    assert(got == Seq(
      (1L, 10.0, Date.valueOf("2020-01-01"), Some(Date.valueOf("2020-02-29")), false),
      (1L, 20.0, Date.valueOf("2020-03-01"), Some(Date.valueOf("2020-06-14")), false),
      (1L, 30.0, Date.valueOf("2020-06-15"), None, true)))
  }

  test("same-day changes collapse to the highest tie-break") {
    val got = run(
      cur = Seq((1L, 10.0)),
      chg = Seq((1L, 20.0, "2020-03-01", 1L), (1L, 25.0, "2020-03-01", 7L)))
    assert(got.map(_._2) == Seq(10.0, 25.0))
  }

  test("a change on the current row's effective date supersedes it") {
    val got = run(
      cur = Seq((1L, 10.0)),
      chg = Seq((1L, 99.0, "2020-01-01", 1L)))
    assert(got == Seq((1L, 99.0, Date.valueOf("2020-01-01"), None, true)))
  }

  test("keys with no changes keep one open version; keys with no current row still version") {
    val got = run(
      cur = Seq((1L, 10.0), (2L, 20.0)),
      chg = Seq((3L, 30.0, "2020-05-01", 1L)))
    assert(got == Seq(
      (1L, 10.0, Date.valueOf("2020-01-01"), None, true),
      (2L, 20.0, Date.valueOf("2020-01-01"), None, true),
      (3L, 30.0, Date.valueOf("2020-05-01"), None, true)))
  }

  test("reserved output columns are rejected up front") {
    val e = intercept[IllegalArgumentException] {
      Scd.scd2(
        Seq((1L, 1.0)).toDF("k", "eff_to"), lit("2020-01-01"),
        Seq((1L, 1.0, "2020-02-01", 1L)).toDF("k", "v", "d", "seq"), col("d"),
        key = "k", attrs = Seq("v"), tieBreak = col("seq"))
    }
    assert(e.getMessage.contains("eff_to"))
  }

  test("internal __prec column and case-variant reserved names are rejected") {
    val e = intercept[IllegalArgumentException] {
      Scd.scd2(
        Seq((1L, 1.0)).toDF("k", "__prec"), lit("2020-01-01"),
        Seq((1L, 1.0, "2020-02-01", 1L)).toDF("k", "v", "d", "seq"), col("d"),
        key = "k", attrs = Seq("v"), tieBreak = col("seq"))
    }
    assert(e.getMessage.contains("__prec"))
    val e2 = intercept[IllegalArgumentException] {
      Scd.scd2(
        Seq((1L, 1.0)).toDF("k", "EFF_FROM"), lit("2020-01-01"),
        Seq((1L, 1.0, "2020-02-01", 1L)).toDF("k", "v", "d", "seq"), col("d"),
        key = "k", attrs = Seq("v"), tieBreak = col("seq"))
    }
    assert(e2.getMessage.contains("EFF_FROM"))
  }
}
