package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Manifest-driven cost statistics: TxLogRelation.sizeInBytes reports
  * the recorded per-file sizes, so Spark's join planner auto-broadcasts
  * a small transactional dimension table — the planning behavior a real
  * star-schema join needs without hand-placed broadcast() hints.
  */
class RelationStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-relstats").resolve("t").toString

  test("sizeInBytes equals the recorded on-disk file sizes") {
    val t = tmpTable()
    TxLog.overwrite((1L to 100L).map(i => (i, s"v$i")).toDF("k", "v"), t)
    val m = TxLog.manifest(spark, t)
    val entries = m.stats.get
    assert(entries.forall(_.bytes.isDefined), "writer must record file sizes")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sessionState.newHadoopConf())
    val onDisk = m.files.map(rel =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(t, rel)).getLen).sum
    assert(entries.flatMap(_.bytes).sum == onDisk)
    val rel = new TxLogRelation(spark, t, None)
    assert(rel.sizeInBytes == onDisk)
  }

  test("a small tx dimension auto-broadcasts in a join (no hint)") {
    val t = tmpTable()
    TxLog.overwrite((1L to 50L).map(i => (i, s"name$i")).toDF("k", "nm"), t)
    val dim = spark.read.format("graft-txlog").load(t)
    val fact = spark.range(0, 10000).select(
      (col("id") % 50 + 1).as("k"), col("id"))
    val joined = fact.join(dim, "k")
    val nodes = joined.queryExecution.sparkPlan.collect { case p => p.nodeName }
    assert(nodes.exists(_.startsWith("BroadcastHashJoin")),
      s"expected auto-broadcast, planned: ${nodes.mkString(", ")}")
    assert(joined.count() == 10000L)
  }

  test("missing sizes fall back to never-broadcast-on-a-guess") {
    val t = tmpTable()
    TxLog.overwrite((1L to 10L).map(i => (i, i * 2)).toDF("k", "x"), t)
    // simulate a pre-statistics manifest: rewrite it without bytes
    val logDir = new java.io.File(s"$t/_txlog")
    val mf = logDir.listFiles().filter(_.getName.endsWith(".json")).head
    val json = new String(Files.readAllBytes(mf.toPath), "UTF-8")
    val stripped = json.replaceAll(""","bytes":\d+""", "")
    assert(stripped != json, "expected bytes fields in the manifest")
    Files.write(mf.toPath, stripped.getBytes("UTF-8"))
    // the in-place rewrite invalidates ChecksumFs's sidecar; drop it
    Files.deleteIfExists(mf.toPath.resolveSibling("." + mf.getName + ".crc"))
    // a pre-statistics manifest comes from an OLDER writer process, so
    // this process's snapshot memo (seeded by our own publish above)
    // would never hold it — drop the memo to match the simulated world
    TxLog.clearSnapshotCache()
    val rel = new TxLogRelation(spark, t, None)
    assert(rel.sizeInBytes > Int.MaxValue.toLong,
      "without sizes the relation must report the safe huge default")
  }

  test("with CBO on, per-column min/max/nullCount fold from the manifest") {
    val t = tmpTable()
    TxLog.overwrite(
      (1L to 200L).map(i => (i, s"v$i", if (i % 4 == 0) null else s"w$i"))
        .toDF("k", "v", "w").repartition(4, col("k")), t)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val df = spark.read.format("graft-txlog").load(t).filter(col("k") > 0L)
      val leafStats = df.queryExecution.optimizedPlan.collectLeaves()
        .map(_.stats).head
      assert(leafStats.rowCount.contains(BigInt(200)))
      val byName = leafStats.attributeStats.toSeq
        .map { case (a, cs) => a.name -> cs }.toMap
      assert(byName("k").min.contains(1L) && byName("k").max.contains(200L),
        s"exact k range expected, got ${byName.get("k")}")
      assert(byName("k").nullCount.contains(BigInt(0)))
      assert(byName("w").nullCount.contains(BigInt(50)),
        s"exact null count expected, got ${byName.get("w")}")
      // estimation plumbing end-to-end: a CBO filter estimate uses the
      // range (no crash, sane cardinality), answers stay exact
      assert(df.filter(col("k") <= 100L).count() == 100L)
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("the optimized plan carries the exact manifest row count") {
    val t = tmpTable()
    TxLog.overwrite((1L to 321L).map(i => (i, s"v$i")).toDF("k", "v"), t)
    val df = spark.read.format("graft-txlog").load(t).filter(col("k") > 0L)
    val stats = df.queryExecution.optimizedPlan.collectLeaves().map(_.stats)
    assert(stats.exists(_.rowCount.contains(BigInt(321))),
      s"expected the exact manifest count, got ${stats.map(_.rowCount)}")
    // a deletion-vectored snapshot would OVERCOUNT from the manifest:
    // it must stay unwrapped (no rowCount) rather than guess
    TxLog.delete(spark, t, col("k") <= 21L, deletionVectors = true)
    val df2 = spark.read.format("graft-txlog").load(t)
    val stats2 =
      df2.queryExecution.optimizedPlan.collectLeaves().map(_.stats)
    assert(stats2.forall(_.rowCount.isEmpty),
      "a DV'd snapshot must never report a (wrong) exact count")
    assert(df2.count() == 300L)
  }
}
