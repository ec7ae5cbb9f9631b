package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** TxLog.dropColumn — metadata-only DROP COLUMN with name tombstones
  * (q119).
  */
class DropColumnSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-dropcol").resolve("t").toString

  test("drop narrows the schema without touching a data file") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a", 10), (2L, "b", 20)).toDF("k", "v", "x"), t)
    val before = TxLog.manifest(spark, t)
    TxLog.dropColumn(spark, t, "x")
    val m = TxLog.manifest(spark, t)
    assert(m.files == before.files) // same bytes on disk
    assert(m.action == "drop_column")
    val got = TxLog.read(spark, t)
    assert(got.schema.fieldNames.toSeq == Seq("k", "v"))
    assert(got.as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    // appends no longer carry the column
    TxLog.append(Seq((3L, "c")).toDF("k", "v"), t)
    assert(TxLog.read(spark, t).count() == 3L)
    // stats for the dropped column were stripped
    assert(m.stats.get.forall(e => !e.stats.contains("x")))
  }

  test("the dropped name is tombstoned against re-adding") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a", 10)).toDF("k", "v", "x"), t)
    TxLog.dropColumn(spark, t, "x")
    val e = intercept[IllegalArgumentException] {
      TxLog.append(Seq((2L, "b", 99)).toDF("k", "v", "x"), t,
        mergeSchema = true)
    }
    assert(e.getMessage.contains("DROPPED"))
    // a NEW name evolves fine
    TxLog.append(Seq((2L, "b", 99L)).toDF("k", "v", "y"), t,
      mergeSchema = true)
    assert(TxLog.read(spark, t).schema.fieldNames.toSeq == Seq("k", "v", "y"))
  }

  test("ADD COLUMN re-adds a dropped name under a fresh physical binding") {
    import org.apache.spark.sql.types.{IntegerType, StructField}
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a", 10), (2L, "b", 20)).toDF("k", "v", "x"), t)
    val wide = TxLog.latestVersion(spark, t).get
    TxLog.dropColumn(spark, t, "x")
    // re-add the SAME name: metadata-only, old values must NOT resurface
    TxLog.addColumns(spark, t, Seq(StructField("x", IntegerType)))
    val got = TxLog.read(spark, t)
    assert(got.schema.fieldNames.toSeq == Seq("k", "v", "x"))
    assert(got.select("x").collect().forall(_.isNullAt(0)),
      "pre-drop values must stay invisible under the re-added name")
    // new writes land under the fresh binding and read back
    TxLog.append(Seq((3L, "c", 33)).toDF("k", "v", "x"), t)
    assert(TxLog.read(spark, t).as[(Long, String, Option[Int])]
      .collect().toSet ==
      Set((1L, "a", None), (2L, "b", None), (3L, "c", Some(33))))
    // time travel to the pre-drop version still sees the ORIGINAL values
    assert(TxLog.readAsOf(spark, t, wide).as[(Long, String, Int)]
      .collect().toSet == Set((1L, "a", 10), (2L, "b", 20)))
    // the binding is genuinely fresh: physical x__2 aliased to logical x
    val m = TxLog.manifest(spark, t)
    assert(m.renames.getOrElse(Map.empty).get("x__2").contains("x"))
    // drop the re-add and re-add AGAIN: the next free slot binds
    TxLog.dropColumn(spark, t, "x")
    TxLog.addColumns(spark, t, Seq(StructField("x", IntegerType)))
    assert(TxLog.read(spark, t).select("x").collect().forall(_.isNullAt(0)))
    assert(TxLog.manifest(spark, t).renames.getOrElse(Map.empty)
      .get("x__3").contains("x"))
  }

  test("SQL ADD COLUMNS re-adds a tombstoned name under a fresh binding") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a", 10)).toDF("k", "v", "x"), t)
    spark.sql("DROP TABLE IF EXISTS readd_sql")
    spark.sql(s"CREATE TABLE readd_sql USING `graft-txlog` OPTIONS (path '$t')")
    try {
      spark.sql("ALTER TABLE readd_sql DROP COLUMN x")
      spark.sql("ALTER TABLE readd_sql ADD COLUMNS (x INT)")
      val got = spark.table("readd_sql")
      assert(got.schema.fieldNames.toSeq == Seq("k", "v", "x"))
      assert(got.select("x").collect().forall(_.isNullAt(0)),
        "pre-drop values must stay invisible through the SQL spelling")
      assert(TxLog.manifest(spark, t).renames.getOrElse(Map.empty)
        .get("x__2").contains("x"))
    } finally spark.sql("DROP TABLE IF EXISTS readd_sql")
  }

  test("rename TO a dropped name binds the new label, nothing resurrects") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a", 10)).toDF("k", "v", "x"), t)
    TxLog.dropColumn(spark, t, "x")
    TxLog.renameColumn(spark, t, "v", "x")
    val got = TxLog.read(spark, t)
    assert(got.schema.fieldNames.toSeq == Seq("k", "x"))
    assert(got.as[(Long, String)].collect().toSeq == Seq((1L, "a")))
  }

  test("load-bearing columns must be released first") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a", 10, 20)).toDF("k", "v", "x", "x2"), t,
      partitionBy = Some(Seq("v")))
    intercept[IllegalArgumentException] { TxLog.dropColumn(spark, t, "v") }
    TxLog.addConstraint(spark, t, "x_pos", "x > 0")
    intercept[IllegalArgumentException] { TxLog.dropColumn(spark, t, "x") }
    TxLog.dropConstraint(spark, t, "x_pos")
    TxLog.setGeneratedColumn(spark, t, "x2", "x * 2")
    intercept[IllegalArgumentException] { TxLog.dropColumn(spark, t, "x") }
    intercept[IllegalArgumentException] { TxLog.dropColumn(spark, t, "x2") }
    TxLog.dropGeneratedColumn(spark, t, "x2")
    TxLog.dropColumn(spark, t, "x")
    assert(TxLog.read(spark, t).schema.fieldNames.toSeq == Seq("k", "v", "x2"))
  }

  test("time travel still sees the column; restore resurrects the wide schema") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a", 10)).toDF("k", "v", "x"), t)
    val wide = TxLog.latestVersion(spark, t).get
    TxLog.dropColumn(spark, t, "x")
    assert(TxLog.readAsOf(spark, t, wide).schema.fieldNames.contains("x"))
    TxLog.restore(spark, t, wide)
    assert(TxLog.read(spark, t).schema.fieldNames.toSeq == Seq("k", "v", "x"))
    // the restore also restores the (empty) tombstone set of that
    // version, so the name is usable again — consistent with the
    // restored schema already CONTAINING the column
    assert(TxLog.read(spark, t).as[(Long, String, Int)].collect().toSeq ==
      Seq((1L, "a", 10)))
  }

  test("bloom index sheds a dropped column automatically") {
    val t = tmpTable()
    TxLog.overwrite((0L until 50L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(4, col("k")), t)
    TxLog.setBloomIndex(spark, t, Seq("k", "v"))
    TxLog.dropColumn(spark, t, "v")
    assert(TxLog.bloomIndexOf(spark, t) == Seq("k"))
    val r = TxLog.readWhere(spark, t, Seq(("k", Some(17L), Some(17L))))
    assert(r.as[Long].collect().toSeq == Seq(17L))
  }
}
