package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** TxLog.clone — zero-copy shallow clone semantics (q110). */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-clone").resolve("t").toString

  private def dataFilesUnder(table: String): Seq[java.nio.file.Path] = {
    val dataDir = java.nio.file.Paths.get(table, "data")
    if (!Files.exists(dataDir)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.walk(dataDir).iterator().asScala
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .toSeq
    }
  }

  test("clone reads the source snapshot without copying any data file") {
    val src = tmpTable(); val dst = tmpTable()
    TxLog.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), src)
    assert(TxLog.clone(spark, src, dst) == 1L)
    assert(TxLog.read(spark, dst).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    // zero-copy: the clone wrote NO data files of its own
    assert(dataFilesUnder(dst).isEmpty)
    // stats carried over (remapped to the borrowed paths), so skipping
    // and metadata aggregates keep working on the clone
    val m = TxLog.manifest(spark, dst)
    assert(m.action == "clone")
    // borrowed entries are FULL URIs (scheme intact) so a clone from a
    // non-default filesystem resolves against the SOURCE's fs
    assert(m.files.forall(f => f.startsWith("file:/")))
    assert(m.stats.exists(es => es.map(_.path).toSet == m.files.toSet))
    assert(m.stats.get.map(_.rows).sum == 2L)
  }

  test("clone and source diverge independently") {
    val src = tmpTable(); val dst = tmpTable()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), src)
    TxLog.clone(spark, src, dst)
    // clone appends under its OWN data dir; source never sees them
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), dst)
    assert(dataFilesUnder(dst).nonEmpty)
    assert(TxLog.read(spark, src).as[(Long, String)].collect().toSeq ==
      Seq((1L, "a")))
    // source overwrites after the clone don't change what the clone
    // reads — it pins the exact files it was cloned from
    TxLog.overwrite(Seq((9L, "z")).toDF("k", "v"), src)
    assert(TxLog.read(spark, dst).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
  }

  test("clone vacuum never reaps borrowed files") {
    val src = tmpTable(); val dst = tmpTable()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), src)
    TxLog.clone(spark, src, dst)
    TxLog.overwrite(Seq((2L, "b")).toDF("k", "v"), dst) // clone moves on
    val deleted = TxLog.vacuum(spark, dst, keepVersions = 1)
    // the dropped clone version referenced ONLY borrowed files — none
    // may be deleted, and the source must still read intact
    assert(deleted.isEmpty)
    assert(TxLog.read(spark, src).as[(Long, String)].collect().toSeq ==
      Seq((1L, "a")))
    assert(TxLog.versions(spark, dst) == Seq(2L))
  }

  test("copy-on-write rewrite on the clone leaves the source intact") {
    val src = tmpTable(); val dst = tmpTable()
    TxLog.overwrite(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), src)
    TxLog.clone(spark, src, dst)
    TxLog.delete(spark, dst, org.apache.spark.sql.functions.col("k") === 2L)
    assert(TxLog.read(spark, dst).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (3L, "c")))
    assert(TxLog.read(spark, src).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("stats skipping prunes through a clone's borrowed entries") {
    val src = tmpTable(); val dst = tmpTable()
    TxLog.overwrite(
      {
        import org.apache.spark.sql.functions.col
        (0L until 400L).map(i => (i, s"v$i")).toDF("k", "v")
          .repartitionByRange(8, col("k"))
      }, src)
    TxLog.clone(spark, src, dst)
    // per-file [min,max] evidence was remapped to the borrowed absolute
    // paths, so a range read through the CLONE plans only the
    // qualifying source files
    val pruned = TxLog.readWhere(spark, dst, Seq(("k", Some(50L), Some(99L))))
    assert(pruned.inputFiles.length <= 2,
      s"clone kept ${pruned.inputFiles.length} of 8 borrowed files")
    assert(pruned.count() == 50L)
  }

  test("constraints and partition layout carry over; clone target must be fresh") {
    val src = tmpTable(); val dst = tmpTable()
    TxLog.overwrite(Seq((1L, "x", 2024), (2L, "y", 2025)).toDF("k", "v", "yr"),
      src, partitionBy = Some(Seq("yr")))
    TxLog.addConstraint(spark, src, "k_pos", "k > 0")
    TxLog.clone(spark, src, dst)
    assert(TxLog.tablePartitionBy(spark, dst) == Seq("yr"))
    assert(TxLog.constraintsOf(spark, dst) == Map("k_pos" -> "k > 0"))
    // the carried CHECK constraint is enforced on clone writes
    intercept[Exception] {
      TxLog.append(Seq((-5L, "bad", 2024)).toDF("k", "v", "yr"), dst)
    }
    // partition metadata survived the path remap
    assert(TxLog.partitions(spark, dst).count() == 2L)
    // cloning over an existing table fails loudly
    val e = intercept[IllegalArgumentException] { TxLog.clone(spark, src, dst) }
    assert(e.getMessage.contains("already has committed versions"))
  }

  test("deep clone: byte-identical reads, total independence from the source") {
    import org.apache.spark.sql.functions.col
    val src = tmpTable(); val dst = tmpTable()
    TxLog.overwrite((0L until 100L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(4, col("k")), src)
    TxLog.addConstraint(spark, src, "k_ok", "k >= 0")
    assert(TxLog.deepClone(spark, src, dst) == 1L)
    // every manifest entry is OWNED (relative) and its bytes exist
    val m = TxLog.manifest(spark, dst)
    assert(m.action == "deep_clone")
    m.files.foreach { rel =>
      assert(!rel.startsWith("/") && !rel.contains(":"), s"borrowed: $rel")
      assert(Files.exists(java.nio.file.Paths.get(dst, rel)), rel)
    }
    val expected = (0L until 100L).map(i => (i, s"v$i")).toSet
    assert(TxLog.read(spark, dst).as[(Long, String)].collect().toSet ==
      expected)
    // metadata carried: constraints still enforce on the clone
    intercept[Exception] {
      TxLog.append(Seq((-1L, "bad")).toDF("k", "v"), dst)
    }
    // obliterate the SOURCE entirely — the deep clone must not notice
    def rmr(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmr)); f.delete(); ()
    }
    rmr(new java.io.File(src))
    TxLog.clearSnapshotCache()
    assert(TxLog.read(spark, dst).as[(Long, String)].collect().toSet ==
      expected, "a deep clone survives the source's deletion outright")
    // and the clone's own vacuum reaps ITS files (independent lifecycle)
    TxLog.overwrite(Seq((1L, "only")).toDF("k", "v"), dst)
    val reaped = TxLog.vacuum(spark, dst, keepVersions = 1)
    assert(reaped.nonEmpty, "the clone's vacuum reaps its own copies")
    assert(TxLog.read(spark, dst).as[(Long, String)].collect().toSeq ==
      Seq((1L, "only")))
  }

  test("deep clone materializes a shallow clone's borrowed files and DVs") {
    import org.apache.spark.sql.functions.col
    val src = tmpTable(); val mid = tmpTable(); val dst = tmpTable()
    TxLog.overwrite((0L until 20L).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(2), src)
    TxLog.delete(spark, src, col("k") < 5L, deletionVectors = true)
    assert(TxLog.manifest(spark, src).dvs.exists(_.nonEmpty))
    TxLog.clone(spark, src, mid) // shallow: borrows files AND dv sidecars
    assert(TxLog.deepClone(spark, mid, dst) == 1L)
    val m = TxLog.manifest(spark, dst)
    (m.files ++ m.dvs.getOrElse(Seq.empty).flatMap(e => Seq(e.path, e.dv)))
      .foreach { rel =>
        assert(!rel.startsWith("/") && !rel.contains(":"),
          s"a deep clone never borrows: $rel")
      }
    val expected = (5L until 20L).map(i => (i, s"v$i")).toSet
    assert(TxLog.read(spark, dst).as[(Long, String)].collect().toSet ==
      expected, "deletion vectors keep their rows dead through the copy")
  }

  test("deep clone carries the bloom index: sidecars copied, pruning live") {
    import org.apache.spark.sql.functions.col
    val src = tmpTable(); val dst = tmpTable()
    TxLog.overwrite((0L until 1000L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(8, col("k")), src)
    TxLog.setBloomIndex(spark, src, Seq("k"))
    assert(TxLog.deepClone(spark, src, dst) == 1L)
    assert(TxLog.bloomIndexOf(spark, dst) == Seq("k"),
      "the index property must carry (sidecars were copied)")
    // destroy the source: the clone's pruning must run on its OWN copies
    def rmr(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmr)); f.delete(); ()
    }
    rmr(new java.io.File(src))
    TxLog.clearSnapshotCache()
    val pruned = TxLog.readWhere(spark, dst, Seq(("k", Some(17L), Some(17L))))
    assert(pruned.inputFiles.length <= 3,
      s"bloom kept ${pruned.inputFiles.length} of 8 files on the clone")
    assert(pruned.as[(Long, String)].collect().toSeq == Seq((17L, "v17")))
  }

  test("CLONE ... VERSION AS OF forks a historical snapshot (both kinds)") {
    import org.apache.spark.sql.functions.col
    val src = tmpTable()
    TxLog.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), src) // v1
    TxLog.append(Seq((3L, "c")).toDF("k", "v"), src)               // v2
    TxLog.delete(spark, src, col("k") === 1L)                      // v3
    val shallow = tmpTable(); val deep = tmpTable()
    TxLog.clone(spark, src, shallow, versionAsOf = Some(2L))
    TxLog.deepClone(spark, src, deep, versionAsOf = Some(1L))
    assert(TxLog.read(spark, shallow).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")), "v2 state, pre-delete")
    assert(TxLog.read(spark, deep).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")), "v1 state")
    intercept[Exception] {
      TxLog.clone(spark, src, tmpTable(), versionAsOf = Some(99L))
    }
    // SQL spelling
    val dst = tmpTable()
    spark.sql("DROP TABLE IF EXISTS clone_src_v")
    spark.sql(
      s"CREATE TABLE clone_src_v USING `graft-txlog` OPTIONS (path '$src')")
    try {
      spark.sql(s"CREATE TABLE '$dst' SHALLOW CLONE clone_src_v " +
        "VERSION AS OF 1")
      assert(TxLog.read(spark, dst).count() == 2L)
      // TIMESTAMP AS OF resolves through the monotonic commit stamps
      val tsV2 = new java.sql.Timestamp(
        TxLog.manifestAt(spark, src, 2L).tsMillis).toString
      val dst2 = tmpTable()
      spark.sql(s"CREATE TABLE '$dst2' CLONE clone_src_v " +
        s"TIMESTAMP AS OF '$tsV2'")
      assert(TxLog.manifest(spark, dst2).action == "deep_clone")
      assert(TxLog.read(spark, dst2).count() == 3L, "v2 state, pre-delete")
    } finally spark.sql("DROP TABLE IF EXISTS clone_src_v")
  }

  test("deep clone copies from executors above the threshold") {
    import org.apache.spark.sql.functions.col
    val src = tmpTable(); val dst = tmpTable()
    TxLog.overwrite((0L until 64L).map(i => (i, i * 2)).toDF("k", "x")
      .repartition(8, col("k")), src)
    val saved = TxLog.vacuumDistributeThreshold
    TxLog.vacuumDistributeThreshold = 4
    try assert(TxLog.deepClone(spark, src, dst) == 1L)
    finally TxLog.vacuumDistributeThreshold = saved
    assert(TxLog.read(spark, dst).as[(Long, Long)].collect().toSet ==
      (0L until 64L).map(i => (i, i * 2)).toSet)
    // no attempt-temp leftovers under the clone's data dirs
    import scala.jdk.CollectionConverters._
    val leftovers = Files.walk(java.nio.file.Paths.get(dst)).iterator()
      .asScala.filter(_.toString.endsWith(".tmp")).toSeq
    assert(leftovers.isEmpty, s"temp files lingered: $leftovers")
  }
}
