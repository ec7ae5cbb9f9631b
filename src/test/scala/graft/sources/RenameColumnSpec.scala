package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** TxLog.renameColumn — metadata-only column mapping (q121): files keep
  * the physical name forever, reads alias to the logical name, writers
  * translate back, metadata lookups (stats/bloom) translate on probe.
  */
class RenameColumnSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-rename").resolve("t").toString

  test("rename relabels reads without touching a data file") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a", 10), (2L, "b", 20)).toDF("k", "v", "x"), t)
    val files = TxLog.manifest(spark, t).files
    TxLog.renameColumn(spark, t, "x", "amount")
    val m = TxLog.manifest(spark, t)
    assert(m.files == files && m.action == "rename_column")
    val got = TxLog.read(spark, t)
    assert(got.schema.fieldNames.toSeq == Seq("k", "v", "amount"))
    assert(got.as[(Long, String, Int)].collect().toSet ==
      Set((1L, "a", 10), (2L, "b", 20)))
  }

  test("writers speak the new name; old and new files agree physically") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, 10)).toDF("k", "x"), t)
    TxLog.renameColumn(spark, t, "x", "amount")
    TxLog.append(Seq((2L, 20)).toDF("k", "amount"), t)
    assert(TxLog.read(spark, t).as[(Long, Int)].collect().toSet ==
      Set((1L, 10), (2L, 20)))
    // the appended file physically stores the ORIGINAL name, so every
    // file generation reads under one stored schema
    val raw = spark.read.parquet(
      TxLog.manifest(spark, t).files.map(f => s"$t/$f"): _*)
    assert(raw.schema.fieldNames.contains("x"))
    assert(!raw.schema.fieldNames.contains("amount"))
    // appending under the OLD name is now plain schema drift
    intercept[Exception] { TxLog.append(Seq((3L, 30)).toDF("k", "x"), t) }
  }

  test("stats skipping and SQL reads keep working under the new name") {
    val t = tmpTable()
    TxLog.overwrite((0L until 400L).map(i => (i, i * 2))
      .toDF("k", "x").repartitionByRange(8, col("k")), t)
    TxLog.renameColumn(spark, t, "k", "row_key")
    val pruned = TxLog.readWhere(spark, t,
      Seq(("row_key", Some(100L), Some(149L))))
    assert(pruned.inputFiles.length <= 2,
      s"stats skipping lost after rename: ${pruned.inputFiles.length} files")
    assert(pruned.count() == 50L)
    // automatic SQL path: pushed filters translate too
    val rel = spark.read.format("graft-txlog").load(t)
    assert(rel.schema.fieldNames.toSeq == Seq("row_key", "x"))
    assert(rel.filter(col("row_key") === 42L).count() == 1L)
    assert(TxLogRelation.lastScanFileCount <= 2)
    // metadata aggregate answers under the logical name
    val agg = TxLog.statsAggregate(spark, t, Seq("row_key"))
    assert(agg.head.getLong(0) == 400L)
    assert(agg.select("row_key_max").head.getLong(0) == 399L)
  }

  test("bloom index probes translate through the rename") {
    val t = tmpTable()
    TxLog.overwrite((0L until 500L).map(i => (i, s"v$i"))
      .toDF("k", "v").repartition(6, col("k")), t)
    TxLog.setBloomIndex(spark, t, Seq("k"))
    TxLog.renameColumn(spark, t, "k", "id")
    val r = TxLog.readWhere(spark, t, Seq(("id", Some(77L), Some(77L))))
    assert(r.inputFiles.length <= 2,
      s"bloom pruning lost after rename: ${r.inputFiles.length} files")
    assert(r.as[(Long, String)].collect().toSeq == Seq((77L, "v77")))
  }

  test("rename interacts safely with DVs, DML, time travel, and drop") {
    val t = tmpTable()
    TxLog.overwrite((0 until 100).map(i => (i.toLong, s"v$i", i % 10))
      .toDF("k", "v", "g").coalesce(2), t)
    val preRename = TxLog.latestVersion(spark, t).get
    TxLog.renameColumn(spark, t, "g", "grp")
    TxLog.delete(spark, t, col("grp") === 3, deletionVectors = true)
    TxLog.update(spark, t, col("grp") === 4, Seq("v" -> col("v").substr(1, 1)))
    val got = TxLog.read(spark, t).as[(Long, String, Int)].collect()
    assert(got.length == 90 && !got.exists(_._3 == 3))
    assert(got.filter(_._3 == 4).forall(_._2 == "v"))
    // time travel before the rename shows the OLD name
    assert(TxLog.readAsOf(spark, t, preRename)
      .schema.fieldNames.contains("g"))
    // dropping the renamed column tombstones BOTH names
    TxLog.dropColumn(spark, t, "grp")
    assert(TxLog.read(spark, t).schema.fieldNames.toSeq == Seq("k", "v"))
    intercept[Exception] {
      TxLog.append(Seq((200L, "x", 1)).toDF("k", "v", "g"), t,
        mergeSchema = true)
    }
    intercept[Exception] {
      TxLog.append(Seq((200L, "x", 1)).toDF("k", "v", "grp"), t,
        mergeSchema = true)
    }
  }

  test("guards: collisions, tombstones, load-bearing columns") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a", 10, 2024)).toDF("k", "v", "x", "yr"), t,
      partitionBy = Some(Seq("yr")))
    intercept[IllegalArgumentException] {
      TxLog.renameColumn(spark, t, "x", "v") // collision
    }
    intercept[IllegalArgumentException] {
      TxLog.renameColumn(spark, t, "yr", "year") // partition column
    }
    TxLog.addConstraint(spark, t, "x_pos", "x > 0")
    intercept[IllegalArgumentException] {
      TxLog.renameColumn(spark, t, "x", "amount") // constraint reference
    }
    TxLog.dropConstraint(spark, t, "x_pos")
    TxLog.renameColumn(spark, t, "x", "amount")
    // chained rename: amount -> total (one manifest entry, physical x)
    TxLog.renameColumn(spark, t, "amount", "total")
    assert(TxLog.read(spark, t).schema.fieldNames.contains("total"))
    assert(TxLog.manifest(spark, t).renames.get == Map("x" -> "total"))
    // rename BACK to the physical name clears the mapping
    TxLog.renameColumn(spark, t, "total", "x")
    assert(TxLog.manifest(spark, t).renames.isEmpty)
  }
}
