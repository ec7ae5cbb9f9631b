package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.SparkSpec
import graft.sources.TxLog

class TxMetadataCountSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft-txcount").resolve("t").toString

  private def scansRelation(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists(_.isInstanceOf[LogicalRelation])

  test("count(*) over graft-txlog folds to a LocalRelation — no scan") {
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
    // THE metadata proof: physically delete every data file — the
    // count still answers because the scan never plans
    import scala.jdk.CollectionConverters._
    val dataDir = java.nio.file.Paths.get(t, "data")
    java.nio.file.Files.walk(dataDir).iterator().asScala.toSeq
      .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists)
    assert(spark.read.format("graft-txlog").load(t).count() == 13L)
  }

  test("ineligible shapes keep the scan and stay correct") {
    val t = tmpTable()
    TxLog.overwrite(Seq(Some(1L), None, Some(3L)).toDF("k"), t)
    def load() = spark.read.format("graft-txlog").load(t)
    // a WHERE below the aggregate: count is no longer the table's rows
    val filtered = load().filter("k > 1").selectExpr("count(*) AS n")
    assert(scansRelation(filtered))
    assert(filtered.as[Long].head() == 1L)
    // count(col) is null-sensitive — must scan
    val countCol = load().selectExpr("count(k) AS n")
    assert(scansRelation(countCol))
    assert(countCol.as[Long].head() == 2L)
    // DISTINCT and grouping — must scan
    val distinct = load().selectExpr("count(DISTINCT k) AS n")
    assert(scansRelation(distinct))
    assert(distinct.as[Long].head() == 2L)
    val grouped = load().groupBy($"k").count()
    assert(scansRelation(grouped))
    assert(grouped.count() == 3L)
    // a mixed output (count(*) next to a real aggregate) — must scan
    val mixed = load().selectExpr("count(*) AS n", "max(k) AS mx")
    assert(scansRelation(mixed))
    assert(mixed.as[(Long, Option[Long])].head() == ((3L, Some(3L))))
  }

  test("SQL catalog spelling and snapshot pinning") {
    val t = tmpTable()
    TxLog.overwrite((1L to 5L).toDF("k"), t)
    spark.sql("DROP TABLE IF EXISTS txcount_spec")
    spark.sql(s"CREATE TABLE txcount_spec USING `graft-txlog` OPTIONS (path '$t')")
    try {
      val sqlCount = spark.sql("SELECT count(*) AS n FROM txcount_spec")
      assert(!scansRelation(sqlCount))
      assert(sqlCount.as[Long].head() == 5L)
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
