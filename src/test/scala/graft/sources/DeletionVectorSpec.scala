package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSpec

/** TxLog deletion vectors (delete(deletionVectors = true), q115):
  * DELETE without rewriting data files — positions to sidecars, every
  * live read anti-joins them out, rewrites materialize them.
  */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-dv").resolve("t").toString

  private def publish(t: String, n: Int = 100, parts: Int = 4): Unit =
    TxLog.overwrite((0 until n).map(i => (i.toLong, s"v$i", i % 10))
      .toDF("k", "v", "g").repartition(parts, col("k")), t)

  test("DV delete removes rows without touching a data file") {
    val t = tmpTable()
    publish(t)
    val before = TxLog.manifest(spark, t)
    val sizes = before.files.map(f =>
      f -> java.nio.file.Files.size(java.nio.file.Paths.get(t, f))).toMap
    TxLog.delete(spark, t, col("g") === 3, deletionVectors = true)
    val after = TxLog.manifest(spark, t)
    // same data files, byte-identical; only the manifest gained vectors
    assert(after.files == before.files)
    after.files.foreach(f =>
      assert(java.nio.file.Files.size(java.nio.file.Paths.get(t, f)) == sizes(f)))
    assert(after.dvs.exists(_.nonEmpty))
    assert(after.dvs.get.map(_.deleted).sum == 10L)
    val got = TxLog.read(spark, t).as[(Long, String, Int)].collect()
    assert(got.length == 90)
    assert(!got.exists(_._3 == 3))
  }

  test("a second DV delete unions positions; full-file deletes drop the file") {
    val t = tmpTable()
    publish(t)
    TxLog.delete(spark, t, col("g") === 3, deletionVectors = true)
    TxLog.delete(spark, t, col("g") === 7, deletionVectors = true)
    val m = TxLog.manifest(spark, t)
    assert(m.dvs.get.map(_.deleted).sum == 20L)
    assert(TxLog.read(spark, t).count() == 80L)
    // delete everything else in one file's worth: every remaining row
    TxLog.delete(spark, t, lit(true), deletionVectors = true)
    val m2 = TxLog.manifest(spark, t)
    assert(m2.files.isEmpty, "all-live-rows-match must DROP files, not vector them")
    assert(TxLog.read(spark, t).count() == 0L)
  }

  test("time travel reads the pre-delete state; restore brings vectors back") {
    val t = tmpTable()
    publish(t)
    val v1 = TxLog.latestVersion(spark, t).get
    val vDel = TxLog.delete(spark, t, col("g") === 0, deletionVectors = true)
    assert(TxLog.readAsOf(spark, t, v1).count() == 100L)
    assert(TxLog.read(spark, t).count() == 90L)
    // an overwrite then a restore to the DV version restores the vectors
    TxLog.overwrite(Seq((999L, "z", 0)).toDF("k", "v", "g"), t)
    TxLog.restore(spark, t, vDel)
    assert(TxLog.manifest(spark, t).dvs.exists(_.nonEmpty))
    assert(TxLog.read(spark, t).count() == 90L)
  }

  test("compact materializes deletion vectors") {
    val t = tmpTable()
    publish(t, n = 100, parts = 8)
    TxLog.delete(spark, t, col("g") === 5, deletionVectors = true)
    TxLog.compact(spark, t, smallFileBytes = 10L << 20,
      targetFileBytes = 10L << 20)
    val m = TxLog.manifest(spark, t)
    assert(m.dvs.forall(_.isEmpty), "rewritten files must not carry vectors")
    val got = TxLog.read(spark, t).as[(Long, String, Int)].collect()
    assert(got.length == 90 && !got.exists(_._3 == 5))
    // with the vectors gone, metadata aggregates work again
    assert(TxLog.statsAggregate(spark, t).head.getLong(0) == 90L)
  }

  test("DV find pass collects ONE driver row per touched file, not per row") {
    val t = tmpTable()
    publish(t) // 100 rows across 4 files, g spread over every file
    TxLog.lastDvFindCollected.set(-1L)
    TxLog.delete(spark, t, col("g") < 5, deletionVectors = true) // 50 rows
    val m = TxLog.manifest(spark, t)
    assert(m.dvs.get.map(_.deleted).sum == 50L)
    assert(TxLog.read(spark, t).count() == 50L)
    // the scale contract: the driver saw one descriptor per touched
    // FILE (positions were aggregated and sidecar'd executor-side) —
    // 4 here, never the 50 changed rows
    assert(TxLog.lastDvFindCollected.get == m.files.size.toLong)
    // DV update path honours the same contract
    TxLog.lastDvFindCollected.set(-1L)
    TxLog.update(spark, t, col("g") === 7, Seq("v" -> lit("u")),
      deletionVectors = true)
    assert(TxLog.lastDvFindCollected.get > 0L)
    assert(TxLog.lastDvFindCollected.get <= 4L)
    assert(TxLog.read(spark, t).filter(col("g") === 7).count() == 10L)
  }

  test("update and rewrite-delete never resurrect vectored rows") {
    val t = tmpTable()
    publish(t)
    TxLog.delete(spark, t, col("k") < 10, deletionVectors = true)
    TxLog.update(spark, t, col("g") === 1, Seq("v" -> lit("upd")))
    val got = TxLog.read(spark, t).as[(Long, String, Int)].collect()
    assert(got.length == 90)
    assert(!got.exists(_._1 < 10))
    assert(got.filter(_._3 == 1).forall(_._2 == "upd"))
    // rewrite-mode delete on a table with vectors also materializes
    TxLog.delete(spark, t, col("g") === 2)
    val got2 = TxLog.read(spark, t).as[(Long, String, Int)].collect()
    assert(got2.length == 81 && !got2.exists(_._3 == 2))
  }

  test("REORG APPLY (PURGE) materializes vectors, touching ONLY vectored files") {
    val t = tmpTable()
    publish(t) // 4 files
    // vector exactly one file's rows: delete a contiguous k-range that
    // hashes into... simpler: delete by k list small enough to hit a
    // subset, then check untouched files survive by identity
    TxLog.delete(spark, t, col("k").isin(0L, 1L, 2L), deletionVectors = true)
    val before = TxLog.manifest(spark, t)
    val vectored = before.dvs.get.map(_.path).toSet
    assert(vectored.nonEmpty && vectored.size < before.files.size,
      "premise: some but not all files carry a vector")
    val v = TxLog.purgeDvs(spark, t)
    val after = TxLog.manifest(spark, t)
    assert(after.version == v && after.action == "purge")
    assert(after.dvs.forall(_.isEmpty), "no vector survives the purge")
    // un-vectored files kept by IDENTITY; vectored ones replaced
    val keptUntouched = before.files.filterNot(vectored)
    assert(keptUntouched.forall(after.files.contains))
    assert(vectored.forall(f => !after.files.contains(f)))
    val got = TxLog.read(spark, t).as[(Long, String, Int)].collect()
    assert(got.length == 97 && !got.exists(_._1 <= 2L))
    // idempotent: a vector-free purge commits nothing
    assert(TxLog.purgeDvs(spark, t) == v)
    // SQL spelling
    val t2 = tmpTable()
    publish(t2)
    TxLog.delete(spark, t2, col("g") === 1, deletionVectors = true)
    val out = spark.sql(s"REORG TABLE '$t2' APPLY (PURGE)").collect()
    assert(out.head.getLong(0) == TxLog.latestVersion(spark, t2).get)
    assert(TxLog.manifest(spark, t2).dvs.forall(_.isEmpty))
    assert(TxLog.read(spark, t2).count() == 90L)
  }

  test("SQL relation applies vectors; the metadata-agg rule keeps the scan") {
    val t = tmpTable()
    publish(t)
    TxLog.delete(spark, t, col("g") === 4, deletionVectors = true)
    val rel = spark.read.format("graft-txlog").load(t)
    assert(rel.count() == 90L) // a folded stats answer would say 100
    assert(rel.filter(col("g") === 4).count() == 0L)
    intercept[IllegalArgumentException] {
      TxLog.statsAggregate(spark, t, Seq("k"))
    }
  }

  test("CDF records DV-deleted rows as pre-images") {
    val t = tmpTable()
    publish(t)
    val v = TxLog.delete(spark, t, col("g") === 6,
      deletionVectors = true, changeFeed = true)
    val feed = TxLog.readChangeFeed(spark, t, v - 1)
    val dels = feed.filter(col("_change_type") === "delete")
    assert(dels.count() == 10L)
    assert(dels.select("g").as[Int].collect().forall(_ == 6))
  }

  test("clone borrows vectors; vacuum reaps sidecars with history") {
    val t = tmpTable(); val c = tmpTable()
    publish(t)
    TxLog.delete(spark, t, col("g") === 9, deletionVectors = true)
    TxLog.clone(spark, t, c)
    assert(TxLog.read(spark, c).count() == 90L)
    // drop the pre-delete version; its only unique artifact is nothing
    // (the delete added just a sidecar) — now overwrite and vacuum to 1:
    // data files AND dv sidecars of dropped versions must leave disk
    val dvRel = TxLog.manifest(spark, t).dvs.get.head.dv
    TxLog.overwrite(Seq((1L, "x", 0)).toDF("k", "v", "g"), t)
    TxLog.vacuum(spark, t, keepVersions = 1)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(t, dvRel)))
  }

  test("DV update vectors old positions and appends post-images") {
    val t = tmpTable()
    publish(t)
    val before = TxLog.manifest(spark, t).files.toSet
    val v = TxLog.update(spark, t, col("g") === 2,
      Seq("v" -> lit("upd")), deletionVectors = true, changeFeed = true)
    val m = TxLog.manifest(spark, t)
    // every original file survives by identity; one fresh write added
    assert(before.subsetOf(m.files.toSet))
    assert(m.files.toSet.size > before.size)
    assert(m.dvs.get.map(_.deleted).sum == 10L)
    val got = TxLog.read(spark, t).as[(Long, String, Int)].collect()
    assert(got.length == 100)
    assert(got.filter(_._3 == 2).forall(_._2 == "upd"))
    assert(got.count(_._3 == 2) == 10)
    // CDF carries the pre/post pair
    val feed = TxLog.readChangeFeed(spark, t, v - 1)
    assert(feed.filter(col("_change_type") === "update_preimage").count() == 10L)
    assert(feed.filter(col("_change_type") === "update_postimage").count() == 10L)
  }

  test("DV merge vectors matched keys and appends the change rows") {
    val t = tmpTable()
    publish(t)
    val before = TxLog.manifest(spark, t).files.toSet
    val changes = Seq(
      (5L, "m5", 9, "U", 1L), (50L, "", 0, "D", 1L), (777L, "new", 9, "U", 1L))
      .toDF("k", "v", "g", "op", "seq")
    TxLog.merge(spark, t, changes, keys = Seq("k"),
      ordering = Seq(col("seq").desc), opCol = "op",
      deletionVectors = true)
    val m = TxLog.manifest(spark, t)
    assert(before.subsetOf(m.files.toSet), "DV merge must rewrite no file")
    assert(m.dvs.get.map(_.deleted).sum == 2L) // the upserted + deleted keys
    val got = TxLog.read(spark, t).as[(Long, String, Int)].collect().toSet
    assert(got.size == 100) // 100 - upsert(5) - delete(50) + new(777) + upd(5)
    assert(got.contains((5L, "m5", 9)) && got.contains((777L, "new", 9)))
    assert(!got.exists(_._1 == 50L))
  }

  test("sidecar codec: gap-varint round-trip, compact, loud on garbage") {
    val cases = Seq(
      Seq.empty[Long], Seq(0L), Seq(7L), (0L until 1000L),
      Seq(5L, 6L, 7L, 1000000L, 1000001L), Seq(Long.MaxValue - 1))
    cases.foreach { ps =>
      assert(TxLog.decodeDv(TxLog.encodeDv(ps)) == ps.distinct.sorted.toSeq)
    }
    // clustered deletes: ~1 byte per position, not 8
    val dense = TxLog.encodeDv(0L until 10000L)
    assert(dense.length < 10000 + 16, s"dense vector took ${dense.length} B")
    intercept[IllegalArgumentException] {
      TxLog.decodeDv(Array[Byte](1, 2, 3, 4, 5))
    }
  }

  test("constraint backfill check sees live rows only") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "ok", 1), (2L, "bad", -5)).toDF("k", "v", "g"), t)
    TxLog.delete(spark, t, col("g") < 0, deletionVectors = true)
    // the violating row is DV-deleted: the constraint must be addable
    TxLog.addConstraint(spark, t, "g_pos", "g > 0")
    assert(TxLog.constraintsOf(spark, t).contains("g_pos"))
  }
}
