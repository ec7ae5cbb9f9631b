package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.SparkSpec
import graft.sources.TxLog

class TxMetadataAggSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft-txcount").resolve("t").toString

  private def scansRelation(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists(_.isInstanceOf[LogicalRelation])

  test("count(*) over graft-txlog folds to the manifest — no scan") {
    val t = tmpTable()
    TxLog.overwrite((1L to 10L).toDF("k"), t)
    TxLog.append((11L to 13L).toDF("k"), t)
    val df = spark.read.format("graft-txlog").load(t).selectExpr("count(*) AS n")
    assert(!scansRelation(df), df.queryExecution.optimizedPlan.toString)
    assert(df.as[Long].head() == 13L)
    assert(spark.read.format("graft-txlog").load(t).count() == 13L)
    // count(1) and a literal companion column are answerable too
    val multi = spark.read.format("graft-txlog").load(t)
      .selectExpr("count(1) AS a", "count(*) AS b", "'tag' AS tag")
    assert(!scansRelation(multi))
    assert(multi.as[(Long, Long, String)].head() == ((13L, 13L, "tag")))
    // count(*) survives a COMPUTED projection below it (rows unchanged)
    val proj = spark.read.format("graft-txlog").load(t)
      .selectExpr("k * 2 AS kk").selectExpr("count(*) AS n")
    assert(!scansRelation(proj))
    assert(proj.as[Long].head() == 13L)
    // THE metadata proof: physically delete every data file — the
    // count still answers because the scan never plans
    import scala.jdk.CollectionConverters._
    val dataDir = java.nio.file.Paths.get(t, "data")
    java.nio.file.Files.walk(dataDir).iterator().asScala.toSeq
      .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists)
    assert(spark.read.format("graft-txlog").load(t).count() == 13L)
  }

  test("count(col)/min/max fold from per-file stats — no scan, exact answers") {
    val t = tmpTable()
    TxLog.overwrite(Seq[(Option[Long], Option[String], Option[Double])](
      (Some(10L), Some("bb"), Some(2.5)), (Some(3L), Some("aa"), None),
      (None, Some("zz"), Some(-1.25))).toDF("k", "v", "x").repartition(2), t)
    TxLog.append(Seq[(Option[Long], Option[String], Option[Double])](
      (Some(42L), None, Some(9.75))).toDF("k", "v", "x"), t)
    def load() = spark.read.format("graft-txlog").load(t)
    val df = load().selectExpr("count(k) AS ck", "min(k) AS mnk", "max(k) AS mxk",
      "min(v) AS mnv", "max(v) AS mxv", "min(x) AS mnx", "max(x) AS mxx")
    assert(!scansRelation(df), df.queryExecution.optimizedPlan.toString)
    assert(df.as[(Long, Option[Long], Option[Long], Option[String], Option[String],
        Option[Double], Option[Double])].head() ==
      ((3L, Some(3L), Some(42L), Some("aa"), Some("zz"), Some(-1.25), Some(9.75))))
    // re-aliased plain columns still map through to the table stats
    val renamed = load().select($"k".as("kk")).selectExpr("min(kk) AS m")
    assert(!scansRelation(renamed))
    assert(renamed.as[Option[Long]].head() == Some(3L))
    // min over an all-NULL slice is NULL, matching SQL semantics
    val tn = tmpTable()
    TxLog.overwrite(Seq[(Option[Long], String)]((None, "a")).toDF("k", "v"), tn)
    val nullMin = spark.read.format("graft-txlog").load(tn)
      .selectExpr("min(k) AS m", "count(k) AS c")
    assert(!scansRelation(nullMin))
    assert(nullMin.as[(Option[Long], Long)].head() == ((None, 0L)))
  }

  test("timestamps fold through the session-timezone render exactly") {
    val t = tmpTable()
    val ts = Seq("2024-03-01 10:00:00", "2023-01-15 23:59:59", "2025-12-31 00:00:01")
      .toDF("s").selectExpr("CAST(s AS TIMESTAMP) AS ts")
    TxLog.overwrite(ts.repartition(2), t)
    val df = spark.read.format("graft-txlog").load(t)
      .selectExpr("CAST(min(ts) AS STRING) AS mn", "CAST(max(ts) AS STRING) AS mx")
    assert(!scansRelation(df))
    assert(df.as[(String, String)].head() ==
      (("2023-01-15 23:59:59", "2025-12-31 00:00:01")))
  }

  test("ineligible shapes keep the scan and stay correct") {
    val t = tmpTable()
    TxLog.overwrite(Seq(Some(1L), None, Some(3L)).toDF("k"), t)
    def load() = spark.read.format("graft-txlog").load(t)
    // a WHERE below the aggregate: stats no longer describe the input
    val filtered = load().filter("k > 1").selectExpr("count(*) AS n")
    assert(scansRelation(filtered))
    assert(filtered.as[Long].head() == 1L)
    // DISTINCT and grouping — must scan
    val distinct = load().selectExpr("count(DISTINCT k) AS n")
    assert(scansRelation(distinct))
    assert(distinct.as[Long].head() == 2L)
    val grouped = load().groupBy($"k").count()
    assert(scansRelation(grouped))
    assert(grouped.count() == 3L)
    // sum/avg aren't in the stats — must scan (even mixed with count)
    val mixed = load().selectExpr("count(*) AS n", "sum(k) AS s")
    assert(scansRelation(mixed))
    assert(mixed.as[(Long, Option[Long])].head() == ((3L, Some(4L))))
    // min over a COMPUTED column — must scan
    val computed = load().selectExpr("k * 2 AS kk").selectExpr("min(kk) AS m")
    assert(scansRelation(computed))
    assert(computed.as[Option[Long]].head() == Some(2L))
    // a column evolved in later (older files lack its stats) — must scan
    val te = tmpTable()
    TxLog.overwrite(Seq(Tuple1(1L)).toDF("k"), te)
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), te, mergeSchema = true)
    val evolved = spark.read.format("graft-txlog").load(te)
      .selectExpr("min(v) AS m", "count(v) AS c")
    assert(scansRelation(evolved))
    assert(evolved.as[(Option[String], Long)].head() == ((Some("b"), 1L)))
    // but count(*) on the same evolved table still folds
    val evolvedCount = spark.read.format("graft-txlog").load(te).count()
    assert(evolvedCount == 2L)
  }

  test("SQL catalog spelling and snapshot pinning") {
    val t = tmpTable()
    TxLog.overwrite((1L to 5L).toDF("k"), t)
    spark.sql("DROP TABLE IF EXISTS txcount_spec")
    spark.sql(s"CREATE TABLE txcount_spec USING `graft-txlog` OPTIONS (path '$t')")
    try {
      val sqlCount = spark.sql(
        "SELECT count(*) AS n, min(k) AS mn, max(k) AS mx FROM txcount_spec")
      assert(!scansRelation(sqlCount), sqlCount.queryExecution.optimizedPlan.toString)
      assert(sqlCount.as[(Long, Option[Long], Option[Long])].head() ==
        ((5L, Some(1L), Some(5L))))
      // pinning: a relation instance counted once keeps its version even
      // as new commits land — same repeatable-read contract as a scan
      val pinned = spark.read.format("graft-txlog").load(t)
      assert(pinned.count() == 5L)
      TxLog.append((6L to 9L).toDF("k"), t)
      assert(pinned.count() == 5L)
      assert(spark.read.format("graft-txlog").load(t).count() == 9L)
    } finally spark.sql("DROP TABLE IF EXISTS txcount_spec")
  }
}
