package graft.sources

import org.apache.spark.sql.{AnalysisException, SaveMode}
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TxLogRelationSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-rel-$tag")
      .resolve("t").toString

  test("format round-trip: writer modes commit, reader plans the snapshot") {
    val t = tmp("rt")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format("graft-txlog").mode(SaveMode.ErrorIfExists).save(t)
    Seq((3L, "c")).toDF("k", "v")
      .write.format("graft-txlog").mode(SaveMode.Append).save(t)
    assert(spark.read.format("graft-txlog").load(t)
      .as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // each mode was ONE commit
    assert(TxLog.versions(spark, t) == Seq(1L, 2L))
    // Ignore on an existing table is a no-op; ErrorIfExists fails loudly
    Seq((9L, "x")).toDF("k", "v")
      .write.format("graft-txlog").mode(SaveMode.Ignore).save(t)
    assert(TxLog.versions(spark, t) == Seq(1L, 2L))
    val e = intercept[IllegalStateException] {
      Seq((9L, "x")).toDF("k", "v")
        .write.format("graft-txlog").mode(SaveMode.ErrorIfExists).save(t)
    }
    assert(e.getMessage.contains("already has committed versions"))
    // Overwrite replaces the snapshot atomically
    Seq((7L, "z")).toDF("k", "v")
      .write.format("graft-txlog").mode(SaveMode.Overwrite).save(t)
    assert(spark.read.format("graft-txlog").load(t)
      .as[(Long, String)].collect().toSeq == Seq((7L, "z")))
  }

  test("versionAsOf option time-travels; reads equal the Scala API") {
    val t = tmp("tt")
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
      .write.format("graft-txlog").mode(SaveMode.Overwrite).save(t) // v1
    Seq((3L, 30L)).toDF("k", "v")
      .write.format("graft-txlog").mode(SaveMode.Append).save(t)    // v2
    val v1 = spark.read.format("graft-txlog").option("versionAsOf", 1).load(t)
    assert(v1.agg(sum("v")).as[Long].head() == 30L)
    assert(v1.collect().toSet == TxLog.readAsOf(spark, t, 1L).collect().toSet)
    assert(spark.read.format("graft-txlog").load(t).collect().toSet ==
      TxLog.read(spark, t).collect().toSet)
  }

  test("SQL surface: CREATE TABLE USING, SELECT, INSERT INTO/OVERWRITE") {
    val t = tmp("sql")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format("graft-txlog").save(t)
    spark.sql("DROP TABLE IF EXISTS rel_sql")
    spark.sql(
      s"CREATE TABLE rel_sql USING `graft-txlog` OPTIONS (path '$t')")
    try {
      assert(spark.sql("SELECT count(*) FROM rel_sql").as[Long].head() == 2L)
      // INSERT INTO = transactional append (one new version, no rewrite)
      spark.sql("INSERT INTO rel_sql VALUES (3, 'c')")
      assert(TxLog.versions(spark, t) == Seq(1L, 2L))
      assert(TxLog.manifest(spark, t).action == "append")
      assert(spark.sql("SELECT sum(k) FROM rel_sql").as[Long].head() == 6L)
      // INSERT OVERWRITE = atomic snapshot replace
      spark.sql("INSERT OVERWRITE TABLE rel_sql VALUES (9, 'z')")
      assert(spark.sql("SELECT k, v FROM rel_sql").as[(Long, String)]
        .collect().toSeq == Seq((9L, "z")))
      // the history survives: time travel still sees the pre-overwrite rows
      assert(TxLog.readAsOf(spark, t, 2L).count() == 3L)
    } finally spark.sql("DROP TABLE IF EXISTS rel_sql")
  }

  test("filters are claimed handled and replayed onto the manifest plan") {
    val t = tmp("pd")
    spark.range(100).select(col("id"),
        (col("id") % 10).as("m"), concat(lit("s"), col("id")).as("s"))
      .write.format("graft-txlog").save(t)
    val rel = new TxLogRelation(spark, t, None)
    import org.apache.spark.sql.sources.{
      EqualTo, GreaterThan, In, IsNotNull, Not, Or, StringStartsWith}
    val handled = Array[org.apache.spark.sql.sources.Filter](
      EqualTo("m", 3L), GreaterThan("id", 50L), In("m", Array(1L, 2L)),
      IsNotNull("s"), StringStartsWith("s", "s9"),
      Or(EqualTo("m", 1L), Not(EqualTo("m", 2L))))
    assert(rel.unhandledFilters(handled).isEmpty)
    // a scan with (filters, pruned columns) returns exactly the
    // matching rows in exactly the requested shape
    val rows = rel.buildScan(Array("id"),
      Array(EqualTo("m", 3L), GreaterThan("id", 50L))).collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq ==
      (51L to 99L).filter(_ % 10 == 3))
    assert(rows.head.length == 1)
    // COUNT(*)-style empty projection still counts rows
    assert(rel.buildScan(Array.empty,
      Array(EqualTo("m", 3L))).count() == 10L)
    // and the DataFrame read pushes through to the parquet scan
    val scanned = spark.read.format("graft-txlog").load(t)
      .filter(col("m") === 3L).select("id")
    assert(scanned.count() == 10L)
  }

  test("a time-travel relation rejects INSERT") {
    val t = tmp("ro")
    Seq((1L, "a")).toDF("k", "v").write.format("graft-txlog").save(t)
    Seq((2L, "b")).toDF("k", "v")
      .write.format("graft-txlog").mode(SaveMode.Append).save(t)
    val rel = new TxLogRelation(spark, t, Some(1L))
    val e = intercept[IllegalArgumentException] {
      rel.insert(Seq((9L, "z")).toDF("k", "v"), overwrite = false)
    }
    assert(e.getMessage.contains("read-only"))
  }

  test("reading a never-written table fails with a pointer to the writer") {
    val t = tmp("missing")
    val e = intercept[RuntimeException] {
      spark.read.format("graft-txlog").load(t).collect()
    }
    assert(e.getMessage.contains("no committed versions"))
  }

  test("SQL WHERE prunes the planned file list from manifest stats") {
    val t = tmp("prune")
    // range-clustered publish: each of the 8 files covers a tight k-range
    val df = spark.range(0, 800).select(col("id").as("k"),
      (col("id") % 7).cast("double").as("v"))
    TxLog.overwrite(df.repartitionByRange(8, col("k")), t)
    val total = TxLog.manifest(spark, t).files.size
    assert(total == 8)
    def scanned[A](body: => A): (A, Int) = {
      TxLogRelation.lastScanFileCount = -1
      val r = body
      (r, TxLogRelation.lastScanFileCount)
    }
    val rel = spark.read.format("graft-txlog").load(t)
    // no filter: every file planned (collect, not count — a bare
    // count() is answered by TxMetadataAgg from the manifest and never
    // scans at all, which is its own spec'd behavior)
    val (n0, f0) = scanned(rel.select("k").collect().length)
    assert(n0 == 800 && f0 == total)
    // a tight range hits 1-2 files; the answer is exact either way
    val (rows, f1) = scanned(
      rel.filter(col("k") >= 100 && col("k") <= 120).collect().length)
    assert(rows == 21 && f1 <= 2)
    // point lookup via SQL equality
    rel.createOrReplaceTempView("prune_t")
    val (one, f2) = scanned(
      spark.sql("SELECT v FROM prune_t WHERE k = 555").collect().length)
    assert(one == 1 && f2 == 1)
    // IN-list keeps only the union of matching files
    val (three, f3) = scanned(
      spark.sql("SELECT v FROM prune_t WHERE k IN (5, 405, 795)")
        .collect().length)
    assert(three == 3 && f3 <= 3)
  }

  test("IsNotNull prunes all-NULL files; IsNull prunes no-NULL files") {
    val t = tmp("prune-null")
    val withNulls = spark.range(0, 10)
      .select(col("id").as("k"), lit(null).cast("string").as("v"))
    TxLog.overwrite(withNulls.coalesce(1), t)
    TxLog.append(spark.range(10, 20)
      .select(col("id").as("k"), lit("x").as("v")).coalesce(1), t)
    val rel = spark.read.format("graft-txlog").load(t)
    TxLogRelation.lastScanFileCount = -1
    assert(rel.filter(col("v").isNotNull).count() == 10)
    assert(TxLogRelation.lastScanFileCount == 1)
    TxLogRelation.lastScanFileCount = -1
    assert(rel.filter(col("v").isNull).count() == 10)
    assert(TxLogRelation.lastScanFileCount == 1)
  }

  test("partition-column equality prunes to the partition's files via parts") {
    val t = tmp("prune-part")
    val df = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0), (4L, "c", 4.0))
      .toDF("k", "g", "v")
    TxLog.overwrite(df, t, partitionBy = Some(Seq("g")))
    val rel = spark.read.format("graft-txlog").load(t)
    TxLogRelation.lastScanFileCount = -1
    assert(rel.filter(col("g") === "a").count() == 2)
    val perA = TxLog.manifest(spark, t).stats.get
      .count(_.parts.exists(_.get("g").contains("a")))
    assert(TxLogRelation.lastScanFileCount == perA)
  }
}
