package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** TxLog.setColumnDefault — write-time column DEFAULTs (the Delta/ANSI
  * `ALTER COLUMN c SET DEFAULT e` surface): an appending frame that
  * OMITS the column gets it computed; a provided column always wins.
  */
class ColumnDefaultSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-default").resolve("t").toString

  test("an omitted defaulted column fills; a provided one wins") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a", 10)).toDF("k", "v", "x"), t)
    TxLog.setColumnDefault(spark, t, "x", "7")
    // frame omits x entirely → filled with the default, table order kept
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t)
    // frame provides x (even null-free) → untouched
    TxLog.append(Seq((3L, "c", 99)).toDF("k", "v", "x"), t)
    assert(TxLog.read(spark, t).as[(Long, String, Int)].collect().toSet ==
      Set((1L, "a", 10), (2L, "b", 7), (3L, "c", 99)))
    // the default is an expression, cast to the column's type
    TxLog.setColumnDefault(spark, t, "x", "2 + 2")
    TxLog.append(Seq((4L, "d")).toDF("k", "v"), t)
    assert(TxLog.read(spark, t).filter(col("k") === 4L)
      .select("x").as[Int].collect().toSeq == Seq(4))
    // DROP DEFAULT: an omitting frame is refused again (schema check)
    TxLog.dropColumnDefault(spark, t, "x")
    intercept[Exception] { TxLog.append(Seq((5L, "e")).toDF("k", "v"), t) }
  }

  test("existing rows never rewrite; restore carries the declaration") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, 10)).toDF("k", "x"), t)
    val before = TxLog.manifest(spark, t)
    TxLog.setColumnDefault(spark, t, "x", "7")
    assert(TxLog.manifest(spark, t).files == before.files,
      "SET DEFAULT is metadata-only")
    val declared = TxLog.manifest(spark, t).version
    TxLog.dropColumnDefault(spark, t, "x")
    TxLog.restore(spark, t, declared)
    assert(TxLog.defaultsOf(spark, t) == Map("x" -> "7"),
      "the declaration rides the property map through restore")
  }

  test("generated, identity, and nondeterministic defaults are refused") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1, 2L)).toDF("x", "twice"), t)
    TxLog.setGeneratedColumn(spark, t, "twice", "x * 2")
    assert(intercept[IllegalArgumentException] {
      TxLog.setColumnDefault(spark, t, "twice", "0")
    }.getMessage.contains("generated"))
    assert(intercept[IllegalArgumentException] {
      TxLog.setColumnDefault(spark, t, "x", "rand()")
    }.getMessage.contains("deterministic"))
    assert(intercept[IllegalArgumentException] {
      TxLog.setColumnDefault(spark, t, "nope", "1")
    }.getMessage.contains("no column"))
    // the validation scaffold exposes an 'id' column — an expression
    // capturing it is NOT constant and must be refused, not deferred
    // to a frame-dependent write-time resolution
    assert(intercept[IllegalArgumentException] {
      TxLog.setColumnDefault(spark, t, "x", "id + 1")
    }.getMessage.contains("constant"))
  }

  test("a frame column matching the default case-insensitively wins") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, 10)).toDF("k", "x"), t)
    TxLog.setColumnDefault(spark, t, "x", "7")
    // Spark resolution is case-insensitive by default: a frame
    // supplying X satisfies the default on x — filling it anyway
    // would land a duplicate/ambiguous column. The provided column
    // wins and is canonicalized to the table's spelling.
    TxLog.append(Seq((2L, 99)).toDF("k", "X"), t)
    assert(TxLog.read(spark, t).as[(Long, Int)].collect().toSet ==
      Set((1L, 10), (2L, 99)))
    assert(TxLog.read(spark, t).columns.toSeq == Seq("k", "x"),
      "the table's canonical column case is preserved")
  }

  test("SQL: ALTER COLUMN SET DEFAULT / DROP DEFAULT") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, 10)).toDF("k", "x"), t)
    spark.sql("DROP TABLE IF EXISTS dflt_sql")
    spark.sql(s"CREATE TABLE dflt_sql USING `graft-txlog` OPTIONS (path '$t')")
    try {
      spark.sql("ALTER TABLE dflt_sql ALTER COLUMN x SET DEFAULT 5 + 2")
      TxLog.append(Seq(2L).toDF("k"), t)
      assert(spark.sql("SELECT x FROM dflt_sql WHERE k = 2")
        .collect()(0).getInt(0) == 7)
      spark.sql("ALTER TABLE dflt_sql ALTER COLUMN x DROP DEFAULT")
      assert(TxLog.defaultsOf(spark, t).isEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS dflt_sql")
  }
}
