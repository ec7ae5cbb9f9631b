package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec

/** TxLog.alterColumnType — metadata-only type widening (q140): the
  * manifest schema widens, Spark 4's parquet readers promote the old
  * files' narrower physical values at scan time, and no data file is
  * rewritten.
  */
class TypeWideningSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-widen").resolve("t").toString

  test("int→long is a catalog edit: no file rewritten, values promote") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1, "a"), (2, "b")).toDF("k", "v"), t)
    val before = TxLog.manifest(spark, t)
    val wideV = TxLog.alterColumnType(spark, t, "k", LongType)
    val m = TxLog.manifest(spark, t)
    assert(m.version == wideV && m.action == "alter_column")
    assert(m.files == before.files) // same bytes on disk
    val got = TxLog.read(spark, t)
    assert(got.schema("k").dataType == LongType)
    assert(got.as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    // new rows land beyond int range
    TxLog.append(Seq((3000000000L, "c")).toDF("k", "v"), t)
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3000000000L, "c")))
    // time travel sees each version under its OWN schema
    assert(TxLog.readAsOf(spark, t, before.version)
      .schema("k").dataType == IntegerType)
  }

  test("the reader widening matrix holds for every accepted pair") {
    // one table per (from, to): write narrow, widen, read back — pins
    // that Spark's parquet readers really perform each promotion this
    // engine's canWiden matrix claims (the matrix is empirical, not
    // aspirational)
    val pairs: Seq[(DataType, DataType, Any, Any)] = Seq(
      (ByteType, ShortType, 7.toByte, 7.toShort),
      (ByteType, IntegerType, 7.toByte, 7),
      (ByteType, LongType, 7.toByte, 7L),
      (ByteType, DoubleType, 7.toByte, 7.0d),
      (ShortType, IntegerType, 7.toShort, 7),
      (ShortType, LongType, 7.toShort, 7L),
      (ShortType, DoubleType, 7.toShort, 7.0d),
      (IntegerType, LongType, 7, 7L),
      (IntegerType, DoubleType, 7, 7.0d),
      (IntegerType, DecimalType(12, 1), 7, BigDecimal("7.0").bigDecimal
        .setScale(1)),
      (LongType, DecimalType(22, 2), 9000000000000000000L,
        BigDecimal("9000000000000000000.00").bigDecimal),
      (FloatType, DoubleType, 2.5f, 2.5d),
      (DecimalType(6, 2), DecimalType(12, 4), BigDecimal("12.50").bigDecimal,
        BigDecimal("12.5000").bigDecimal))
    pairs.foreach { case (from, to, narrow, wide) =>
      val t = tmpTable()
      val df = spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(narrow)),
        StructType(Seq(StructField("x", from))))
      TxLog.overwrite(df, t)
      TxLog.alterColumnType(spark, t, "x", to)
      val got = TxLog.read(spark, t).collect()
      assert(got.length == 1 && got(0).get(0) == wide,
        s"${from.simpleString}→${to.simpleString}: got ${got(0).get(0)}")
    }
  }

  test("appends upcast a matching narrower frame at the write head") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1, 10)).toDF("k", "x"), t)
    TxLog.alterColumnType(spark, t, "x", LongType)
    // the pipeline still produces ints: the write head casts up, the
    // committed file carries the TABLE's type
    TxLog.append(Seq((2, 20)).toDF("k", "x"), t)
    val got = TxLog.read(spark, t)
    assert(got.schema("x").dataType == LongType)
    assert(got.as[(Int, Long)].collect().toSet == Set((1, 10L), (2, 20L)))
    // stats of the upcast append compare in the wide domain: a readWhere
    // on the widened column plans only the matching file
    val kept = TxLog.readWhere(spark, t, Seq(("x", Some(15L), None)))
    assert(kept.as[(Int, Long)].collect().toSet == Set((2, 20L)))
  }

  test("stats keep pruning after integral widening; float→double strips") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1, 1.5f), (2, 2.5f)).toDF("k", "f")
      .repartitionByRange(2, col("k")), t)
    TxLog.alterColumnType(spark, t, "k", LongType)
    assert(TxLog.manifest(spark, t).stats.get.forall(_.stats.contains("k")),
      "integral widening keeps the column's stats")
    // int-rendered bounds prune in the long domain
    val kept = TxLog.readWhere(spark, t, Seq(("k", Some(2L), None)))
    assert(kept.select("k").as[Long].collect().toSeq == Seq(2L))
    TxLog.alterColumnType(spark, t, "f", DoubleType)
    val m = TxLog.manifest(spark, t)
    assert(m.stats.get.forall(e => !e.stats.contains("f")),
      "float→double strips the column's stats (render round-trip unsafe)")
    // reads stay exact without the stats
    assert(TxLog.read(spark, t).select("f").as[Double].collect().toSet ==
      Set(1.5d, 2.5d))
  }

  test("metadata answers keep working after integral widening") {
    val t = tmpTable()
    TxLog.overwrite(Seq((3, "a"), (9, "b")).toDF("k", "v"), t)
    TxLog.alterColumnType(spark, t, "k", LongType)
    // the stored narrow-rendered stats fold back under the WIDE type
    val got = TxLog.statsAggregate(spark, t, Seq("k")).collect()(0)
    assert(got.getLong(0) == 2L)
    assert(got.getLong(1) == 3L && got.getLong(2) == 9L,
      "min/max round-trip through the widened domain")
  }

  test("widening sheds the column's bloom index (typed sidecar hashes)") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1, "a"), (2, "b")).toDF("k", "v"), t)
    TxLog.setBloomIndex(spark, t, Seq("k", "v"))
    TxLog.append(Seq((3, "c")).toDF("k", "v"), t) // sidecars hash int k
    TxLog.alterColumnType(spark, t, "k", LongType)
    val m = TxLog.manifest(spark, t)
    assert(m.bloomIndex.getOrElse(Seq.empty) == Seq("v"),
      "a long probe cannot find int-hashed entries — the index is shed")
    // reads and point lookups stay correct without it
    assert(TxLog.read(spark, t).filter(col("k") === 3L).count() == 1L)
  }

  test("widening a renamed column widens the physical field") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1, 10)).toDF("k", "x"), t)
    TxLog.renameColumn(spark, t, "x", "y")
    TxLog.alterColumnType(spark, t, "y", LongType)
    val got = TxLog.read(spark, t)
    assert(got.schema.fieldNames.toSeq == Seq("k", "y"))
    assert(got.schema("y").dataType == LongType)
    assert(got.as[(Int, Long)].collect().toSeq == Seq((1, 10L)))
  }

  test("narrowing, cross-family, and load-bearing columns are refused") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a", 10, 1.0f)).toDF("k", "v", "x", "f"), t,
      partitionBy = Some(Seq("x")))
    assert(intercept[IllegalArgumentException] {
      TxLog.alterColumnType(spark, t, "k", IntegerType)
    }.getMessage.contains("lossless widenings"))
    assert(intercept[IllegalArgumentException] {
      TxLog.alterColumnType(spark, t, "v", LongType)
    }.getMessage.contains("lossless widenings"))
    assert(intercept[IllegalArgumentException] {
      TxLog.alterColumnType(spark, t, "k", LongType)
    }.getMessage.contains("already has type"))
    // long→double would lose precision beyond 2^53 — refused
    assert(intercept[IllegalArgumentException] {
      TxLog.alterColumnType(spark, t, "k", DoubleType)
    }.getMessage.contains("lossless widenings"))
    assert(intercept[IllegalArgumentException] {
      TxLog.alterColumnType(spark, t, "x", LongType)
    }.getMessage.contains("partition column"))
    TxLog.addConstraint(spark, t, "f_pos", "f > 0")
    assert(intercept[IllegalArgumentException] {
      TxLog.alterColumnType(spark, t, "f", DoubleType)
    }.getMessage.contains("CHECK constraint"))
  }

  test("a generated column and its sources are pinned to their types") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1, 2L)).toDF("x", "twice"), t)
    TxLog.setGeneratedColumn(spark, t, "twice", "x * 2")
    assert(intercept[IllegalArgumentException] {
      TxLog.alterColumnType(spark, t, "twice", DecimalType(22, 0))
    }.getMessage.contains("generated column"))
    assert(intercept[IllegalArgumentException] {
      TxLog.alterColumnType(spark, t, "x", LongType)
    }.getMessage.contains("derives from"))
  }

  test("SQL: ALTER TABLE … ALTER COLUMN … TYPE on a catalog table") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1, "a")).toDF("k", "v"), t)
    spark.sql("DROP TABLE IF EXISTS widen_sql")
    spark.sql(s"CREATE TABLE widen_sql USING `graft-txlog` OPTIONS (path '$t')")
    try {
      val v = spark.sql(
        "ALTER TABLE widen_sql ALTER COLUMN k TYPE BIGINT").collect()
      assert(v.length == 1 && v(0).getLong(0) > 0)
      val got = spark.table("widen_sql")
      assert(got.schema("k").dataType == LongType)
      assert(got.select("k").as[Long].collect().toSeq == Seq(1L))
      // the CHANGE COLUMN spelling too
      spark.sql("ALTER TABLE widen_sql CHANGE COLUMN k TYPE DECIMAL(22, 0)")
      assert(spark.table("widen_sql").schema("k").dataType ==
        DecimalType(22, 0))
    } finally spark.sql("DROP TABLE IF EXISTS widen_sql")
  }

  test("DML after widening: rewrites land wide on both CoW and DV paths") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
      .repartitionByRange(3, col("k")), t)
    TxLog.alterColumnType(spark, t, "k", LongType)
    // copy-on-write UPDATE touches a narrow file; the rewrite reads
    // promoted longs and writes the TABLE's type
    TxLog.update(spark, t, col("k") === 2L,
      Seq("v" -> org.apache.spark.sql.functions.lit("B")))
    // DV DELETE on another narrow file
    TxLog.delete(spark, t, col("k") === 3L, deletionVectors = true)
    // merge upserts through the widened key
    import org.apache.spark.sql.functions.expr
    TxLog.mergeInto(spark, t, Seq((1L, "A2"), (4L, "d")).toDF("k", "v"),
      expr("t.k = s.k"),
      matched = Seq(TxLog.MergeUpdate(Map("v" -> expr("s.v")))),
      notMatched = Seq(TxLog.MergeInsert(Map(
        "k" -> expr("s.k"), "v" -> expr("s.v")))))
    val got = TxLog.read(spark, t)
    assert(got.schema("k").dataType == LongType)
    assert(got.as[(Long, String)].collect().toSet ==
      Set((1L, "A2"), (2L, "B"), (4L, "d")))
  }

  test("the change feed skips the widening version and coerces across it") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1, "a")).toDF("k", "v"), t)
    val v0 = TxLog.manifest(spark, t).version
    TxLog.append(Seq((2, "b")).toDF("k", "v"), t)
    TxLog.alterColumnType(spark, t, "k", LongType)
    TxLog.append(Seq((3000000000L, "c")).toDF("k", "v"), t)
    val feed = TxLog.readChangeFeed(spark, t, sinceVersion = v0)
    val rows = feed.select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((2L, "insert"), (3000000000L, "insert")))
  }
}
