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
}
