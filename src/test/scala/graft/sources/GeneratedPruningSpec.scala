package graft.sources

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.functions.{col, expr, to_date}

import graft.SparkSpec

/** Generated-column PREDICATE DERIVATION ([[GeneratedDerivation]] +
  * TxLogRelation.derivedGenerated): a filter on the raw SOURCE column
  * of a generated partition column implies a filter on the generated
  * column itself, so the partition layout prunes for the queries users
  * actually write (`WHERE o_orderdate BETWEEN …` over a
  * year-partitioned table). Planned-file counts are pinned via
  * TxLogRelation.lastScanFileCount.
  */
class GeneratedPruningSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-genprune").resolve("t").toString

  /** 36 monthly rows over 2019–2021, partitioned by a generated year:
    * one file per (year) partition at minimum; the date stats inside
    * each file span the whole year.
    */
  private def yearTable(): String = {
    val t = tmpTable()
    val rows = for (y <- 2019 to 2021; m <- 1 to 12)
      yield (s"$y-${f"$m%02d"}-15", y.toLong * 100 + m)
    val df = rows.toDF("ds", "v")
      .select(to_date(col("ds")).as("d"), col("v"))
      .withColumn("y", expr("CAST(year(d) AS INT)"))
    TxLog.overwrite(df, t, partitionBy = Some(Seq("y")))
    TxLog.setGeneratedColumn(spark, t, "y", "CAST(year(d) AS INT)")
    t
  }

  private def files(t: String): Int = TxLog.manifest(spark, t).files.size

  test("a raw date range derives year bounds and prunes partitions") {
    val t = yearTable()
    val total = files(t)
    assert(total >= 3, "at least one file per year partition")
    val got = spark.read.format("graft-txlog").load(t)
      .filter(col("d") >= Date.valueOf("2020-03-01") &&
        col("d") <= Date.valueOf("2020-09-30"))
      .as[(Date, Long, Int)].collect()
    assert(got.length == 7 && got.forall(_._3 == 2020))
    val perYear = total / 3
    assert(TxLogRelation.lastScanFileCount <= perYear,
      s"kept ${TxLogRelation.lastScanFileCount} of $total files — " +
        "the derived y-bounds must keep only 2020's partition")
  }

  test("equality and IN on the source derive exactly") {
    val t = yearTable()
    val total = files(t)
    val eq = spark.read.format("graft-txlog").load(t)
      .filter(col("d") === Date.valueOf("2019-06-15"))
      .as[(Date, Long, Int)].collect()
    assert(eq.map(_._2).toSeq == Seq(2019L * 100 + 6))
    assert(TxLogRelation.lastScanFileCount <= total / 3)
    val in = spark.read.format("graft-txlog").load(t)
      .filter(col("d").isin(
        Date.valueOf("2019-01-15"), Date.valueOf("2021-12-15")))
      .as[(Date, Long, Int)].collect()
    assert(in.length == 2)
    assert(TxLogRelation.lastScanFileCount <= 2 * total / 3,
      "the derived IN keeps 2019 and 2021, never 2020")
  }

  test("month generation derives ranges only inside one year") {
    val t = tmpTable()
    val rows = for (y <- 2020 to 2021; m <- 1 to 12)
      yield (s"$y-${f"$m%02d"}-10", (y * 100 + m).toLong)
    val df = rows.toDF("ds", "v")
      .select(to_date(col("ds")).as("d"), col("v"))
      .withColumn("mo", expr("CAST(month(d) AS INT)"))
    TxLog.overwrite(df, t, partitionBy = Some(Seq("mo")))
    TxLog.setGeneratedColumn(spark, t, "mo", "CAST(month(d) AS INT)")
    val total = files(t)
    assert(total >= 12)
    // same-year range: month bounds derive (Feb..Apr keeps 3 of 12)
    val sameYear = spark.read.format("graft-txlog").load(t)
      .filter(col("d") >= Date.valueOf("2020-02-01") &&
        col("d") <= Date.valueOf("2020-04-30"))
      .as[(Date, Long, Int)].collect()
    assert(sameYear.length == 3)
    assert(TxLogRelation.lastScanFileCount <= total / 4,
      s"kept ${TxLogRelation.lastScanFileCount} of $total — " +
        "same-year month bounds must prune")
    // cross-year range: month is cyclic, deriving [11, 2] would be
    // WRONG — the scan must keep everything and stay correct
    val crossYear = spark.read.format("graft-txlog").load(t)
      .filter(col("d") >= Date.valueOf("2020-11-01") &&
        col("d") <= Date.valueOf("2021-02-28"))
      .as[(Date, Long, Int)].collect()
    assert(crossYear.length == 4, "Nov, Dec, Jan, Feb")
    assert(crossYear.map(_._3).toSet == Set(11, 12, 1, 2))
  }

  test("date_format and substring shapes derive; opaque ones do not") {
    val t = tmpTable()
    val rows = for (y <- 2020 to 2021; m <- 1 to 12)
      yield (s"$y-${f"$m%02d"}-10", (y * 100 + m).toLong)
    val df = rows.toDF("ds", "v")
      .select(to_date(col("ds")).as("d"), col("v"))
      .withColumn("ym", expr("date_format(d, 'yyyy-MM')"))
    TxLog.overwrite(df, t, partitionBy = Some(Seq("ym")))
    TxLog.setGeneratedColumn(spark, t, "ym", "date_format(d, 'yyyy-MM')")
    val total = files(t)
    assert(total >= 24)
    val got = spark.read.format("graft-txlog").load(t)
      .filter(col("d") >= Date.valueOf("2020-11-01") &&
        col("d") <= Date.valueOf("2021-02-28"))
      .as[(Date, Long, String)].collect()
    assert(got.length == 4)
    // 'yyyy-MM' strings order chronologically: the cross-year range
    // derives ["2020-11", "2021-02"] — 4 of 24 partitions
    assert(TxLogRelation.lastScanFileCount <= total / 4,
      s"kept ${TxLogRelation.lastScanFileCount} of $total")
    // an opaque (non-monotone) generation derives nothing and stays
    // correct: hash(d) classifies to None
    val t2 = tmpTable()
    TxLog.overwrite(
      Seq((Date.valueOf("2020-01-01"), 1L))
        .toDF("d", "v").withColumn("h", expr("pmod(hash(d), 4)")), t2)
    TxLog.setGeneratedColumn(spark, t2, "h", "pmod(hash(d), 4)")
    val all = spark.read.format("graft-txlog").load(t2)
      .filter(col("d") === Date.valueOf("2020-01-01")).collect()
    assert(all.length == 1)
  }

  test("timestamp source: ONLY the derivation can prune (ts stats are excluded)") {
    // timestamp bounds never join the stats compare (their toString
    // render differs from the stats' — documented in prunedFiles), so
    // any pruning here is attributable to the derived year bounds alone
    val t = tmpTable()
    val rows = for (y <- 2019 to 2021; m <- 1 to 12)
      yield (s"$y-${f"$m%02d"}-15 12:00:00", (y * 100 + m).toLong)
    val df = rows.toDF("tss", "v")
      .select(col("tss").cast("timestamp").as("ts"), col("v"))
      .withColumn("y", expr("CAST(year(ts) AS INT)"))
    TxLog.overwrite(df, t, partitionBy = Some(Seq("y")))
    TxLog.setGeneratedColumn(spark, t, "y", "CAST(year(ts) AS INT)")
    val total = files(t)
    assert(total >= 3)
    val got = spark.read.format("graft-txlog").load(t)
      .filter(col("ts") >= java.sql.Timestamp.valueOf("2020-01-01 00:00:00") &&
        col("ts") <= java.sql.Timestamp.valueOf("2020-12-31 23:59:59"))
      .as[(java.sql.Timestamp, Long, Int)].collect()
    assert(got.length == 12 && got.forall(_._3 == 2020))
    assert(TxLogRelation.lastScanFileCount <= total / 3,
      s"kept ${TxLogRelation.lastScanFileCount} of $total files — " +
        "only the derived y-bounds can have pruned this scan")
  }

  test("derivation composes with direct filters and never loses rows") {
    val t = yearTable()
    // raw-date filter alone vs raw-date + explicit generated filter:
    // identical answers (the derivation is an implied conjunct, not a
    // row filter)
    val raw = spark.read.format("graft-txlog").load(t)
      .filter(col("d") >= Date.valueOf("2019-07-01") &&
        col("d") <= Date.valueOf("2021-06-30"))
      .as[(Date, Long, Int)].collect().toSet
    assert(raw.size == 24)
    val both = spark.read.format("graft-txlog").load(t)
      .filter(col("d") >= Date.valueOf("2019-07-01") &&
        col("d") <= Date.valueOf("2021-06-30") &&
        col("y") >= 2019 && col("y") <= 2021)
      .as[(Date, Long, Int)].collect().toSet
    assert(both == raw)
  }
}
