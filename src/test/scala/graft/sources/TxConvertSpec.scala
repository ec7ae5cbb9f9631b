package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** TxLog.convert — adopt a plain-parquet directory in place (q130):
  * no data movement, complete per-file stats, full-citizen DML after,
  * loud refusals for Hive layouts and already-converted tables.
  */
class TxConvertSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-convert").resolve("t").toString

  private def mtimes(dir: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet") &&
        !p.toString.contains("_txlog"))
      .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis)
      .toMap
  }

  test("convert adopts the directory without touching a data byte") {
    val dir = tmpDir()
    Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, "d", 40))
      .toDF("k", "v", "n").repartition(3, col("k"))
      .write.parquet(dir)
    val before = mtimes(dir)
    assert(before.nonEmpty)
    assert(TxLog.convert(spark, dir) == 1L)
    // exact same files, byte-untouched (paths AND mtimes)
    assert(mtimes(dir) == before, "convert must not rewrite or move files")
    val m = TxLog.manifest(spark, dir)
    assert(m.action == "convert")
    assert(m.files.size == before.size)
    // adopted entries are table-root-RELATIVE (owned: vacuum can reap
    // them after a rewrite de-references them)
    assert(m.files.forall(f => !f.startsWith("/") && !f.contains(":")))
    assert(TxLog.read(spark, dir).as[(Long, String, Int)].collect().toSet ==
      Set((1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, "d", 40)))
  }

  test("converted stats are complete and drive skipping + metadata aggregates") {
    val dir = tmpDir()
    // k-clustered files => disjoint k ranges => skipping has teeth
    Seq.tabulate(40)(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .write.parquet(dir)
    TxLog.convert(spark, dir)
    val m = TxLog.manifest(spark, dir)
    val entries = m.stats.get
    assert(entries.map(_.rows).sum == 40L, "per-file row counts complete")
    assert(entries.forall(_.bytes.exists(_ > 0L)),
      "listing sizes recorded as cost statistics")
    assert(entries.forall(_.stats.contains("k")), "min/max recorded")
    // stats pruning: a one-decile range must plan fewer files than all
    assert(TxLog.readWhere(spark, dir, Seq(("k", None, Some(5L))))
      .count() == 6L)
    val planned = TxLog.pruneByConjuncts(m,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType))),
      Seq(("k", org.apache.spark.sql.types.LongType, None, Some("5"))))
    assert(planned.size < m.files.size,
      s"pruning had no effect: ${planned.size} of ${m.files.size}")
    // metadata-only count over the converted manifest
    assert(TxLog.statsAggregate(spark, dir)
      .collect()(0).getAs[Long]("n_rows") == 40L)
  }

  test("a converted table is a full citizen: DML, optimize, vacuum reap adopted files") {
    val dir = tmpDir()
    Seq((1L, "keep"), (2L, "kill"), (3L, "keep2")).toDF("k", "v")
      .repartition(3, col("k")).write.parquet(dir)
    TxLog.convert(spark, dir)
    TxLog.delete(spark, dir, col("v") === "kill")
    assert(TxLog.read(spark, dir).as[(Long, String)].collect().toSet ==
      Set((1L, "keep"), (3L, "keep2")))
    TxLog.append(Seq((9L, "new")).toDF("k", "v"), dir)
    TxLog.compact(spark, dir)
    // compaction rewrote everything into data/<uuid>; vacuuming to the
    // latest version reaps the de-referenced ADOPTED originals too
    val reaped = TxLog.vacuum(spark, dir, keepVersions = 1)
    assert(reaped.exists(r => !r.startsWith("data/")),
      s"expected an adopted original among the reaped: $reaped")
    assert(TxLog.read(spark, dir).as[(Long, String)].collect().toSet ==
      Set((1L, "keep"), (3L, "keep2"), (9L, "new")))
  }

  test("heterogeneous file schemas union-merge; absent columns null-fill") {
    val dir = tmpDir()
    Seq((1L, "a")).toDF("k", "v").write.parquet(dir + "/part1")
    Seq((2L, "b", 99)).toDF("k", "v", "extra").write.parquet(dir + "/part2")
    TxLog.convert(spark, dir)
    val got = TxLog.read(spark, dir).select("k", "v", "extra")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)))).toSet
    assert(got == Set((1L, "a", None), (2L, "b", Some(99))))
  }

  test("refusals: hive layout, existing table, empty dir; idempotent re-convert") {
    val hive = tmpDir()
    Seq((1L, "a", 2020), (2L, "b", 2021)).toDF("k", "v", "y")
      .write.partitionBy("y").parquet(hive)
    val e = intercept[IllegalArgumentException](TxLog.convert(spark, hive))
    assert(e.getMessage.contains("Hive-partitioned"))

    val dir = tmpDir()
    Seq((1L, "a")).toDF("k", "v").write.parquet(dir)
    assert(TxLog.convert(spark, dir) == 1L)
    // an identical convert is idempotent (lost-ack / race stance)…
    assert(TxLog.convert(spark, dir) == 1L)
    // …but any other commit on top makes a re-convert a loud error
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), dir)
    val e2 = intercept[IllegalArgumentException](TxLog.convert(spark, dir))
    assert(e2.getMessage.contains("already has committed versions"))

    val empty = tmpDir()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(empty))
    val e3 = intercept[IllegalArgumentException](TxLog.convert(spark, empty))
    assert(e3.getMessage.contains("no parquet files"))
  }

  test("statsColumns = 0 skips min/max but keeps complete row counts") {
    val dir = tmpDir()
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").repartition(2)
      .write.parquet(dir)
    TxLog.convert(spark, dir, statsColumns = 0)
    val m = TxLog.manifest(spark, dir)
    assert(m.stats.get.map(_.rows).sum == 2L)
    assert(m.stats.get.forall(_.stats.isEmpty))
    assert(TxLog.statsAggregate(spark, dir)
      .collect()(0).getAs[Long]("n_rows") == 2L)
  }
}
