package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Per-file Bloom filter index (TxLog.setBloomIndex / bloomPrune):
  * point-lookup file skipping where min/max stats cannot help — a
  * high-cardinality key hash-scattered across files makes every file
  * span the whole key range, so stats pruning keeps everything while
  * the sidecar filters keep ~1 file (+ fpp stragglers).
  */
class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-bloom").resolve("t").toString

  /** 1000 rows hash-scattered over 8 files: every file's [min,max] on k
    * spans nearly the whole domain, the worst case for stats skipping.
    */
  private def publishScattered(t: String): Unit = {
    val df = (0L until 1000L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(8, col("k"))
    TxLog.overwrite(df, t)
  }

  test("setBloomIndex backfills sidecars and point reads prune to ~1 file") {
    val t = tmpTable()
    publishScattered(t)
    TxLog.setBloomIndex(spark, t, Seq("k"))
    assert(TxLog.bloomIndexOf(spark, t) == Seq("k"))
    // stats alone cannot prune this layout
    val statsOnly = TxLog.readWhere(spark, t, Seq(("v", Some("v17"), Some("v17"))))
    assert(statsOnly.inputFiles.length == 8) // v not indexed; stats keep all
    val pruned = TxLog.readWhere(spark, t, Seq(("k", Some(17L), Some(17L))))
    // the true file + at most a straggler or two (fpp 0.01 over 8 files)
    assert(pruned.inputFiles.length <= 3,
      s"bloom kept ${pruned.inputFiles.length} of 8 files")
    assert(pruned.as[(Long, String)].collect().toSeq == Seq((17L, "v17")))
  }

  test("backfill spans multiple commits' data dirs") {
    val t = tmpTable()
    // three commits → three data/<uuid> dirs; the backfill must map
    // every scanned file back to its rel across all of them
    TxLog.overwrite((0L until 300L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(2, col("k")), t)
    TxLog.append((300L until 600L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(2, col("k")), t)
    TxLog.append((600L until 1000L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(2, col("k")), t)
    TxLog.setBloomIndex(spark, t, Seq("k"))
    assert(TxLog.lastBloomBuildMode.get() == "driver")
    val pruned = TxLog.readWhere(spark, t, Seq(("k", Some(777L), Some(777L))))
    assert(pruned.inputFiles.length <= 2,
      s"bloom kept ${pruned.inputFiles.length} of 6 files")
    assert(pruned.as[(Long, String)].collect().toSeq == Seq((777L, "v777")))
  }

  test("above the threshold the sidecars are written from executors") {
    val t = tmpTable()
    publishScattered(t)
    TxLog.append((1000L until 2000L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(8, col("k")), t)
    val saved = TxLog.vacuumDistributeThreshold
    TxLog.vacuumDistributeThreshold = 4 // force the distributed path
    try {
      TxLog.setBloomIndex(spark, t, Seq("k"))
      assert(TxLog.lastBloomBuildMode.get() == "distributed")
    } finally TxLog.vacuumDistributeThreshold = saved
    // every live file got its sidecar (no torn/missing writes)…
    val m = TxLog.manifest(spark, t)
    m.files.foreach { rel =>
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(t, "_bloom", rel, "k.bloom")), rel)
    }
    // …no temp leftovers…
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(t, "_bloom"))
    try {
      val it = walk.iterator()
      while (it.hasNext) {
        val p = it.next().toString
        assert(!p.endsWith(".tmp"), s"attempt-temp must not linger: $p")
      }
    } finally walk.close()
    // …and the index prunes exactly as the driver-built one does
    val pruned = TxLog.readWhere(spark, t, Seq(("k", Some(17L), Some(17L))))
    assert(pruned.inputFiles.length <= 4,
      s"bloom kept ${pruned.inputFiles.length} of 16 files")
    assert(pruned.as[(Long, String)].collect().toSeq == Seq((17L, "v17")))
  }

  test("appends inherit the index: fresh files get sidecars automatically") {
    val t = tmpTable()
    publishScattered(t)
    TxLog.setBloomIndex(spark, t, Seq("k"))
    TxLog.append(
      (1000L until 2000L).map(i => (i, s"v$i")).toDF("k", "v")
        .repartition(8, col("k")), t)
    val pruned = TxLog.readWhere(spark, t, Seq(("k", Some(1500L), Some(1500L))))
    assert(pruned.inputFiles.length <= 4,
      s"bloom kept ${pruned.inputFiles.length} of 16 files")
    assert(pruned.as[(Long, String)].collect().toSeq == Seq((1500L, "v1500")))
  }

  test("the SQL path probes the sidecars for = and IN") {
    val t = tmpTable()
    publishScattered(t)
    TxLog.setBloomIndex(spark, t, Seq("k"))
    val rel = spark.read.format("graft-txlog").load(t)
    assert(rel.filter(col("k") === 421L).as[(Long, String)].collect().toSeq ==
      Seq((421L, "v421")))
    assert(TxLogRelation.lastScanFileCount <= 3,
      s"SQL = kept ${TxLogRelation.lastScanFileCount} of 8 files")
    assert(rel.filter(col("k").isin(3L, 700L)).as[(Long, String)]
      .collect().toSet == Set((3L, "v3"), (700L, "v700")))
    assert(TxLogRelation.lastScanFileCount <= 5,
      s"SQL IN kept ${TxLogRelation.lastScanFileCount} of 8 files")
    // a definitely-absent key prunes everything (bar fpp stragglers)
    assert(rel.filter(col("k") === 999999L).count() == 0L)
    assert(TxLogRelation.lastScanFileCount <= 2)
  }

  test("missing sidecars and unindexed columns never prune") {
    val t = tmpTable()
    publishScattered(t)
    TxLog.setBloomIndex(spark, t, Seq("k"))
    // wipe the sidecars: pruning must degrade to keep-everything
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(t, "_bloom"), true)
    val r = TxLog.readWhere(spark, t, Seq(("k", Some(17L), Some(17L))))
    assert(r.inputFiles.length == 8)
    assert(r.as[(Long, String)].collect().toSeq == Seq((17L, "v17")))
  }

  test("dropBloomIndex unsets the property; rewrites keep the index complete") {
    val t = tmpTable()
    publishScattered(t)
    TxLog.setBloomIndex(spark, t, Seq("k"))
    // a rewrite (delete) produces fresh files — they must carry sidecars
    TxLog.delete(spark, t, col("k") < 100L)
    val pruned = TxLog.readWhere(spark, t, Seq(("k", Some(500L), Some(500L))))
    assert(pruned.inputFiles.length <= 3)
    assert(pruned.as[(Long, String)].collect().toSeq == Seq((500L, "v500")))
    TxLog.dropBloomIndex(spark, t)
    assert(TxLog.bloomIndexOf(spark, t).isEmpty)
    val live = TxLog.manifest(spark, t).files.size
    val after = TxLog.readWhere(spark, t, Seq(("k", Some(500L), Some(500L))))
    assert(after.inputFiles.length == live) // no probe: every live file kept
    assert(after.as[(Long, String)].collect().toSeq == Seq((500L, "v500")))
  }

  test("vacuum reaps sidecars with their files") {
    val t = tmpTable()
    publishScattered(t)
    TxLog.setBloomIndex(spark, t, Seq("k"))
    val v1Files = TxLog.manifest(spark, t).files
    TxLog.overwrite((0L until 10L).map(i => (i, s"w$i")).toDF("k", "v"), t)
    TxLog.vacuum(spark, t, keepVersions = 1)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sessionState.newHadoopConf())
    v1Files.foreach { rel =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(t, s"_bloom/$rel")),
        s"sidecar dir for reaped $rel survived vacuum")
    }
  }

  test("bloom sidecars work under a Hive-partitioned layout") {
    val t = tmpTable()
    // partition dirs mean same-named part files across directories —
    // the sidecar path mapping must key on the full data/<uuid> suffix
    val df = (0L until 600L).map(i => (i, s"v$i", (i % 3).toInt))
      .toDF("k", "v", "p").repartition(4, col("k"))
    TxLog.overwrite(df, t, partitionBy = Some(Seq("p")))
    TxLog.setBloomIndex(spark, t, Seq("k"))
    val pruned = TxLog.readWhere(spark, t, Seq(("k", Some(123L), Some(123L))))
    assert(pruned.inputFiles.length <= 3,
      s"bloom kept ${pruned.inputFiles.length} files on a partitioned table")
    assert(pruned.as[(Long, String, Int)].collect().toSeq ==
      Seq((123L, "v123", 0)))
    // appends under the layout keep the index complete
    TxLog.append((600L until 900L).map(i => (i, s"v$i", (i % 3).toInt))
      .toDF("k", "v", "p").repartition(4, col("k")), t)
    val p2 = TxLog.readWhere(spark, t, Seq(("k", Some(777L), Some(777L))))
    assert(p2.as[(Long, String, Int)].collect().toSeq == Seq((777L, "v777", 0)))
    assert(p2.inputFiles.length <= 4)
  }

  test("a clone's borrowed files read correctly without the source's sidecars") {
    val t = tmpTable(); val c = tmpTable()
    publishScattered(t)
    TxLog.setBloomIndex(spark, t, Seq("k"))
    TxLog.clone(spark, t, c)
    // the clone's probe resolves under ITS root, finds nothing, and
    // keeps every borrowed file — unpruned but never wrong
    val r = TxLog.readWhere(spark, c, Seq(("k", Some(17L), Some(17L))))
    assert(r.as[(Long, String)].collect().toSeq == Seq((17L, "v17")))
  }

  test("the index property survives RESTORE (table property, not row state)") {
    val t = tmpTable()
    publishScattered(t)
    val preIndex = TxLog.latestVersion(spark, t).get
    TxLog.setBloomIndex(spark, t, Seq("k"))
    TxLog.overwrite((0L until 100L).map(i => (i, s"w$i")).toDF("k", "v")
      .repartition(4, col("k")), t)
    TxLog.restore(spark, t, preIndex)
    // restore rolls back ROWS; the index remains declared (deliberate:
    // a maintenance property outlives data rollbacks, like constraints
    // would if the restored schema still binds them) and fresh writes
    // keep building sidecars
    assert(TxLog.bloomIndexOf(spark, t) == Seq("k"))
    TxLog.append((2000L until 2200L).map(i => (i, s"n$i")).toDF("k", "v")
      .repartition(2, col("k")), t)
    val r = TxLog.readWhere(spark, t, Seq(("k", Some(2100L), Some(2100L))))
    assert(r.as[(Long, String)].collect().toSeq == Seq((2100L, "n2100")))
  }

  test("non-indexable and absent columns fail loudly at set time") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, 2.5)).toDF("k", "x"), t)
    intercept[IllegalArgumentException] {
      TxLog.setBloomIndex(spark, t, Seq("x")) // double: not indexable
    }
    intercept[IllegalArgumentException] {
      TxLog.setBloomIndex(spark, t, Seq("nope"))
    }
  }

  test("string keys probe with the column's own hashing") {
    val t = tmpTable()
    TxLog.overwrite(
      (0 until 500).map(i => (s"id-$i", i)).toDF("sid", "n")
        .repartition(6, col("sid")), t)
    TxLog.setBloomIndex(spark, t, Seq("sid"))
    val r = TxLog.readWhere(spark, t, Seq(("sid", Some("id-321"), Some("id-321"))))
    assert(r.inputFiles.length <= 2,
      s"bloom kept ${r.inputFiles.length} of 6 files")
    assert(r.as[(String, Int)].collect().toSeq == Seq(("id-321", 321)))
  }
}
