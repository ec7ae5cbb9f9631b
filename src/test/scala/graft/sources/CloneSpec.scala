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
}
