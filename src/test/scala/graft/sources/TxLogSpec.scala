package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class TxLogSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-txlog").resolve("t").toString

  test("overwrite + read round-trips content and schema") {
    val t = tmpTable()
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    assert(TxLog.overwrite(df, t) == 1L)
    val got = TxLog.read(spark, t)
    // parquet reads are nullable-normalized; names and types round-trip
    assert(got.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(got.as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
  }

  test("append unions with the parent snapshot; versions are sequential") {
    val t = tmpTable()
    assert(TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t) == 1L)
    assert(TxLog.append(Seq((2L, "b")).toDF("k", "v"), t) == 2L)
    assert(TxLog.append(Seq((3L, "c")).toDF("k", "v"), t) == 3L)
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(TxLog.versions(spark, t) == Seq(1L, 2L, 3L))
  }

  test("time travel: readAsOf(N-1) after an overwrite sees the old table") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "old")).toDF("k", "v"), t)
    TxLog.overwrite(Seq((9L, "new")).toDF("k", "v"), t)
    assert(TxLog.readAsOf(spark, t, 1L).as[(Long, String)].collect().toSeq ==
      Seq((1L, "old")))
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSeq ==
      Seq((9L, "new")))
    val e = intercept[IllegalArgumentException] { TxLog.readAsOf(spark, t, 7L) }
    assert(e.getMessage.contains("no version 7"))
  }

  test("snapshot isolation: a resolved reader survives a concurrent overwrite") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "old")).toDF("k", "v"), t)
    val pinned = TxLog.read(spark, t) // resolves version 1's file list
    TxLog.overwrite(Seq((9L, "new")).toDF("k", "v"), t)
    // the overwrite added a manifest + new files; version 1's files are
    // untouched, so the pinned frame still returns the old rows
    assert(pinned.as[(Long, String)].collect().toSeq == Seq((1L, "old")))
  }

  test("mid-commit state is invisible: tmp manifests and unreferenced data dirs") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t)
    // simulate a crashed commit: data files written, manifest still .tmp
    Seq((2L, "ghost")).toDF("k", "v").write
      .parquet(s"$t/data/crashed-commit")
    Files.write(java.nio.file.Paths.get(s"$t/_txlog/.tmp-crashed.json"),
      "{\"not\":\"a manifest\"}".getBytes("UTF-8"))
    assert(TxLog.versions(spark, t) == Seq(1L))
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSeq ==
      Seq((1L, "a")))
  }

  test("vacuum drops only files no kept version references") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t) // v1 files
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t) // v2 = v1 + new
    TxLog.overwrite(Seq((9L, "z")).toDF("k", "v"), t) // v3: fresh only
    val deleted = TxLog.vacuum(spark, t, keepVersions = 1)
    // v1/v2's files are unreferenced by v3 and must be gone
    assert(deleted.nonEmpty)
    val f = new java.io.File(t)
    deleted.foreach(rel => assert(!new java.io.File(f, rel).exists(), rel))
    assert(TxLog.versions(spark, t) == Seq(3L))
    intercept[IllegalArgumentException] { TxLog.readAsOf(spark, t, 2L) }
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSeq ==
      Seq((9L, "z")))
  }

  test("vacuum reaps on executors above the distribute threshold") {
    import org.apache.spark.sql.functions.col
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "v").repartitionByRange(4, col("k")), t)
    TxLog.setBloomIndex(spark, t, Seq("k")) // sidecars must go with files
    TxLog.overwrite(Seq((9L, "z")).toDF("k", "v"), t)
    val saved = TxLog.vacuumDistributeThreshold
    TxLog.vacuumDistributeThreshold = 1 // force the distributed path
    try {
      val deleted = TxLog.vacuum(spark, t, keepVersions = 1)
      assert(deleted.count(!_.startsWith("_txlog/")) >= 4)
      val f = new java.io.File(t)
      deleted.foreach(rel => assert(!new java.io.File(f, rel).exists(), rel))
      deleted.filterNot(_.startsWith("_txlog/")).foreach(rel =>
        assert(!new java.io.File(f, s"_bloom/$rel").exists(), s"_bloom/$rel"))
      assert(TxLog.read(spark, t).as[(Long, String)].collect().toSeq ==
        Seq((9L, "z")))
    } finally TxLog.vacuumDistributeThreshold = saved
  }

  test("vacuum keeps files shared between dropped and kept versions") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t) // v1
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t) // v2 references v1's files
    TxLog.vacuum(spark, t, keepVersions = 1) // drops v1's manifest only
    // v1's data files are still referenced by v2 and must survive
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
  }

  test("empty dataframe commits and reads back empty with schema") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v").limit(0), t)
    val got = TxLog.read(spark, t)
    assert(got.count() == 0)
    assert(got.columns.toSeq == Seq("k", "v"))
  }

  test("append with a drifted schema is rejected") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t)
    val e = intercept[IllegalArgumentException] {
      TxLog.append(Seq((2L, 3.5)).toDF("k", "other"), t)
    }
    assert(e.getMessage.contains("schema mismatch"))
    // overwrite MAY change the schema
    TxLog.overwrite(Seq((2L, 3.5)).toDF("k", "other"), t)
    assert(TxLog.read(spark, t).columns.toSeq == Seq("k", "other"))
  }

  test("reading a never-committed table fails loudly") {
    val e = intercept[RuntimeException] { TxLog.read(spark, tmpTable()) }
    assert(e.getMessage.contains("no committed versions"))
  }

  // -------------------------------------------------------------------
  // File stats + data skipping
  // -------------------------------------------------------------------

  /** 40 rows of k=0..39 range-partitioned into 4 files → per-file k
    * ranges are disjoint decades.
    */
  private def rangedTable(): String = {
    val t = tmpTable()
    import org.apache.spark.sql.functions.col
    val df = (0 until 40).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartitionByRange(4, col("k"))
    TxLog.overwrite(df, t)
    t
  }

  test("commits record per-file row counts and min/max stats") {
    val t = rangedTable()
    val m = TxLog.manifest(spark, t)
    val entries = m.stats.getOrElse(fail("no stats in manifest"))
    assert(entries.map(_.path).toSet == m.files.toSet)
    assert(entries.map(_.rows).sum == 40L)
    // each file's [min,max] over k is a tight disjoint range
    val ranges = entries.map(e => (BigDecimal(e.stats("k").min.get),
      BigDecimal(e.stats("k").max.get))).sortBy(_._1)
    assert(ranges.size == 4)
    ranges.sliding(2).foreach { case Seq((_, aMax), (bMin, _)) =>
      assert(aMax < bMin, "file ranges overlap")
    }
    // string column stats exist too; nulls counted
    assert(entries.forall(_.stats("v").nulls == 0L))
  }

  test("readBetween prunes files by stats and still answers exactly") {
    val t = rangedTable()
    val pruned = TxLog.readBetween(spark, t, "k", Some(12L), Some(17L))
    // only the decade file holding 10..19 qualifies
    assert(pruned.inputFiles.length == 1,
      s"expected 1 planned file, got ${pruned.inputFiles.length}")
    assert(pruned.select("k").as[Long].collect().sorted.toSeq == (12L to 17L))
    // unbounded sides
    assert(TxLog.readBetween(spark, t, "k", None, Some(5L)).inputFiles.length == 1)
    assert(TxLog.readBetween(spark, t, "k", Some(35L), None).inputFiles.length == 1)
    // a no-hit range plans zero files and returns zero rows
    val none = TxLog.readBetween(spark, t, "k", Some(100L), Some(200L))
    assert(none.inputFiles.isEmpty && none.count() == 0)
  }

  test("readBetween skips all-NULL files (range predicates reject NULL)") {
    val t = tmpTable()
    val withNulls = Seq((Some(1L), "a"), (Some(2L), "b")).toDF("k", "v")
    TxLog.overwrite(withNulls, t)
    TxLog.append(Seq((Option.empty[Long], "n1"), (Option.empty[Long], "n2"))
      .toDF("k", "v").coalesce(1), t)
    val got = TxLog.readBetween(spark, t, "k", Some(0L), Some(10L))
    assert(got.select("v").as[String].collect().toSet == Set("a", "b"))
    assert(got.inputFiles.length < TxLog.read(spark, t).inputFiles.length)
  }

  test("readBetween rejects unknown and non-comparable columns") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, Array[Byte](1))).toDF("k", "blob"), t)
    val e1 = intercept[IllegalArgumentException] {
      TxLog.readBetween(spark, t, "nope", Some(1), None)
    }
    assert(e1.getMessage.contains("no column"))
    val e2 = intercept[IllegalArgumentException] {
      TxLog.readBetween(spark, t, "blob", Some(1), None)
    }
    assert(e2.getMessage.contains("not range-comparable"))
  }

  test("stats survive append and date columns skip chronologically") {
    val t = tmpTable()
    import org.apache.spark.sql.functions.{col, date_add, lit, to_date}
    def days(from: String, n: Int) =
      spark.range(n).select(
        to_date(date_add(lit(from).cast("date"), col("id").cast("int"))).as("d"))
    TxLog.overwrite(days("2024-01-01", 10).coalesce(1), t)
    TxLog.append(days("2024-06-01", 10).coalesce(1), t)
    val jan = TxLog.readBetween(spark, t, "d", Some("2024-01-03"), Some("2024-01-05"))
    assert(jan.inputFiles.length == 1)
    assert(jan.count() == 3)
  }

  // -------------------------------------------------------------------
  // Compaction
  // -------------------------------------------------------------------

  test("compact bin-packs small files, preserves rows, keeps time travel") {
    val t = tmpTable()
    val df = (0 until 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    TxLog.overwrite(df.repartition(10), t) // 10 shards
    val before = TxLog.read(spark, t)
    assert(before.inputFiles.length == 10)
    val v = TxLog.compact(spark, t, smallFileBytes = 1L << 20,
      targetFileBytes = 1L << 20)
    assert(v == 2L)
    val after = TxLog.read(spark, t)
    assert(after.inputFiles.length < 10)
    assert(after.as[(Long, String)].collect().toSet ==
      df.as[(Long, String)].collect().toSet)
    // pre-compaction snapshot still resolves (old files retained)
    assert(TxLog.readAsOf(spark, t, 1L).count() == 100)
    // vacuum now drops the 10 replaced shards but none of the packed files
    val deleted = TxLog.vacuum(spark, t, keepVersions = 1)
    assert(deleted.size == 10)
    assert(TxLog.read(spark, t).count() == 100)
  }

  test("compact leaves large files alone and no-ops when nothing qualifies") {
    val t = tmpTable()
    TxLog.overwrite((0 until 50).map(i => (i.toLong, i.toString)).toDF("k", "v")
      .coalesce(1), t)
    // the one file is "large" under a 1-byte threshold: nothing to pack
    assert(TxLog.compact(spark, t, smallFileBytes = 1L) == 1L)
    assert(TxLog.versions(spark, t) == Seq(1L))
    // with a generous threshold but a single file, still a no-op (< 2)
    assert(TxLog.compact(spark, t) == 1L)
  }

  test("compact retains stats for untouched files and recomputes packed ones") {
    val t = rangedTable() // 4 ranged files
    // make one extra file that stays untouched under a tiny threshold is
    // impossible deterministically, so pack EVERYTHING and check stats
    TxLog.append((100 until 200).map(i => (i.toLong, s"w$i")).toDF("k", "v")
      .coalesce(1), t)
    TxLog.compact(spark, t, smallFileBytes = 1L << 30, targetFileBytes = 1L << 30)
    val m = TxLog.manifest(spark, t)
    assert(m.action == "compact")
    val entries = m.stats.getOrElse(fail("stats lost by compaction"))
    assert(entries.map(_.path).toSet == m.files.toSet)
    assert(entries.map(_.rows).sum == 140L)
    // skipping still works through the packed layout
    assert(TxLog.readBetween(spark, t, "k", Some(150L), Some(160L))
      .count() == 11)
  }

  // -------------------------------------------------------------------
  // Transactional merge
  // -------------------------------------------------------------------

  test("merge applies CDC semantics through the log") {
    import org.apache.spark.sql.functions.col
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "bal"), t)
    val changes = Seq(
      (2L, 99.0, "U", 1), // update key 2
      (3L, 0.0, "D", 1), // delete key 3
      (4L, 40.0, "I", 1) // insert key 4
    ).toDF("k", "bal", "op", "seq")
    val v = TxLog.merge(spark, t, changes, keys = Seq("k"),
      ordering = Seq(col("seq").desc), opCol = "op")
    assert(v == 2L)
    assert(TxLog.read(spark, t).select("k", "bal").as[(Long, Double)]
      .collect().toSet == Set((1L, 10.0), (2L, 99.0), (4L, 40.0)))
    // the pre-merge snapshot is still readable (snapshot isolation)
    assert(TxLog.readAsOf(spark, t, 1L).count() == 3)
  }

  test("merge into a never-committed table fails loudly") {
    import org.apache.spark.sql.functions.col
    val e = intercept[RuntimeException] {
      TxLog.merge(spark, tmpTable(), Seq((1L, 1.0, "U")).toDF("k", "bal", "op"),
        Seq("k"), Seq(col("bal").desc), "op")
    }
    assert(e.getMessage.contains("no committed versions"))
  }

  // -------------------------------------------------------------------
  // Idempotent (exactly-once) streaming append
  // -------------------------------------------------------------------

  test("idempotentAppend commits a batch once and skips its replay") {
    val t = tmpTable()
    TxLog.overwrite(Seq((0L, "seed")).toDF("k", "v"), t)
    assert(TxLog.idempotentAppend(Seq((1L, "b0")).toDF("k", "v"), t,
      appId = "loader", batchId = 0L).contains(2L))
    // replayed batch (restart semantics): same appId+batchId → no commit
    assert(TxLog.idempotentAppend(Seq((1L, "b0-replay")).toDF("k", "v"), t,
      appId = "loader", batchId = 0L).isEmpty)
    assert(TxLog.versions(spark, t) == Seq(1L, 2L))
    assert(TxLog.read(spark, t).count() == 2)
    // next batch commits; a DIFFERENT app's batch 0 also commits
    assert(TxLog.idempotentAppend(Seq((2L, "b1")).toDF("k", "v"), t,
      appId = "loader", batchId = 1L).contains(3L))
    assert(TxLog.idempotentAppend(Seq((9L, "other")).toDF("k", "v"), t,
      appId = "backfill", batchId = 0L).contains(4L))
    assert(TxLog.read(spark, t).count() == 4)
  }

  test("txn watermarks survive unrelated commits and skip stale batches") {
    val t = tmpTable()
    TxLog.overwrite(Seq((0L, "seed")).toDF("k", "v"), t)
    TxLog.idempotentAppend(Seq((1L, "b5")).toDF("k", "v"), t, "loader", 5L)
    // an unrelated overwrite must carry the watermark forward, or a
    // later replay of batch <=5 would double-append
    TxLog.overwrite(Seq((7L, "rewrite")).toDF("k", "v"), t)
    assert(TxLog.idempotentAppend(Seq((1L, "b4-late")).toDF("k", "v"), t,
      "loader", 4L).isEmpty)
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((7L, "rewrite")))
  }

  test("a skipped idempotent batch leaves no orphan data files") {
    val t = tmpTable()
    TxLog.overwrite(Seq((0L, "seed")).toDF("k", "v"), t)
    TxLog.idempotentAppend(Seq((1L, "b0")).toDF("k", "v"), t, "app", 0L)
    def dataDirs(): Set[String] = {
      val d = new java.io.File(t, "data")
      Option(d.list()).map(_.toSet).getOrElse(Set.empty)
    }
    val before = dataDirs()
    TxLog.idempotentAppend(Seq((1L, "replay")).toDF("k", "v"), t, "app", 0L)
    assert(dataDirs() == before, "skip left an orphaned data directory")
  }

  test("exactly-once through a real foreachBatch sink under batch replay") {
    import org.apache.spark.sql.streaming.Trigger
    val t = tmpTable()
    TxLog.overwrite(Seq((-1L, -1L)).toDF("value", "doubled"), t)
    val srcDir = Files.createTempDirectory("txlog-stream-src").toString
    spark.range(1, 3).toDF("value").write.mode("overwrite").parquet(srcDir)
    // no checkpoint: each run restarts batch ids at 0 and re-delivers
    // everything — exactly the at-least-once replay a crashed-and-
    // restarted query produces, absorbed by the txn watermark
    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("value LONG")
        .parquet(srcDir)
        .selectExpr("value", "value * 2 AS doubled")
        .writeStream
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          TxLog.idempotentAppend(batch, t, appId = "stream-spec", batchId = id)
          ()
        }
        .start()
      q.awaitTermination(120000)
      ()
    }
    runOnce()
    runOnce()
    val rows = TxLog.read(spark, t).as[(Long, Long)].collect().toSet
    assert(rows == Set((-1L, -1L), (1L, 2L), (2L, 4L)),
      s"replayed batch must not double-append: $rows")
  }

  // -------------------------------------------------------------------
  // Copy-on-write DELETE / UPDATE
  // -------------------------------------------------------------------

  test("delete drops whole files by row count and rewrites only the boundary") {
    import org.apache.spark.sql.functions.{col, lit}
    val t = rangedTable() // k 0..39 in 4 disjoint decade files
    val before = TxLog.manifest(spark, t).files
    val v = TxLog.delete(spark, t, col("k") < lit(15L))
    assert(v == 2L)
    val m = TxLog.manifest(spark, t)
    assert(m.action == "delete")
    // decade 0-9: dropped whole (no rewrite); 10-19: rewritten; 20-39 files
    // untouched — their manifest paths are literally the old ones
    val untouched = m.files.toSet.intersect(before.toSet)
    assert(untouched.size == 2, s"expected 2 untouched files, got $untouched")
    assert(m.files.size == 3)
    assert(TxLog.read(spark, t).select("k").as[Long].collect().sorted.toSeq ==
      (15L to 39L))
    // stats follow the rewrite; skipping still works
    assert(m.stats.get.map(_.rows).sum == 25L)
    assert(TxLog.readBetween(spark, t, "k", Some(0L), Some(14L)).count() == 0)
    // pre-delete snapshot is intact (snapshot isolation + time travel)
    assert(TxLog.readAsOf(spark, t, 1L).count() == 40)
  }

  test("delete keeps rows where the predicate is NULL and no-ops on no match") {
    import org.apache.spark.sql.functions.{col, lit}
    val t = tmpTable()
    TxLog.overwrite(Seq((Some(1L), "a"), (None, "nul"), (Some(9L), "z"))
      .toDF("k", "v"), t)
    TxLog.delete(spark, t, col("k") > lit(5L))
    assert(TxLog.read(spark, t).select("v").as[String].collect().toSet ==
      Set("a", "nul"), "NULL predicate must keep the row (SQL DELETE semantics)")
    // nothing matches → same version back, no new commit
    val v = TxLog.latestVersion(spark, t).get
    assert(TxLog.delete(spark, t, col("k") > lit(100L)) == v)
    assert(TxLog.versions(spark, t).last == v)
  }

  test("delete of every row leaves an empty table with its schema") {
    import org.apache.spark.sql.functions.lit
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    TxLog.delete(spark, t, lit(true))
    val got = TxLog.read(spark, t)
    assert(got.count() == 0 && got.columns.toSeq == Seq("k", "v"))
    assert(TxLog.manifest(spark, t).files.isEmpty)
  }

  test("update rewrites only files containing matches and casts to the column type") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val t = rangedTable()
    val before = TxLog.manifest(spark, t).files
    val v = TxLog.update(spark, t, col("k") >= 20L,
      Seq("v" -> concat(lit("u"), col("k"))))
    assert(v == 2L)
    val m = TxLog.manifest(spark, t)
    assert(m.action == "update")
    // decades 0-9 and 10-19 have no match: files untouched by path
    assert(m.files.toSet.intersect(before.toSet).size == 2)
    val got = TxLog.read(spark, t).as[(Long, String)].collect().toMap
    assert(got(5L) == "v5" && got(19L) == "v19")
    assert(got(20L) == "u20" && got(39L) == "u39")
    // an int assignment is cast to the declared string type, not drifted
    TxLog.update(spark, t, col("k") === 0L, Seq("v" -> lit(123)))
    val m2 = TxLog.manifest(spark, t)
    assert(m2.schemaJson == m.schemaJson, "update must not drift the schema")
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toMap.apply(0L) == "123")
  }

  test("update validates assignments and leaves NULL-predicate rows unchanged") {
    import org.apache.spark.sql.functions.{col, lit}
    val t = tmpTable()
    TxLog.overwrite(Seq((Some(1L), "a"), (None, "nul")).toDF("k", "v"), t)
    val e = intercept[IllegalArgumentException] {
      TxLog.update(spark, t, lit(true), Seq("nope" -> lit("x")))
    }
    assert(e.getMessage.contains("no column"))
    TxLog.update(spark, t, col("k") >= 0L, Seq("v" -> lit("hit")))
    assert(TxLog.read(spark, t).select("v").as[String].collect().toSet ==
      Set("hit", "nul"), "NULL predicate must leave the row unchanged")
  }

  // -------------------------------------------------------------------
  // Append-only change feed
  // -------------------------------------------------------------------

  test("readAppendsSince returns exactly the appended rows from only new files") {
    val t = tmpTable()
    val base = TxLog.overwrite(Seq((1L, "base")).toDF("k", "v"), t)
    TxLog.append(Seq((2L, "b1")).toDF("k", "v"), t)
    val mid = TxLog.latestVersion(spark, t).get
    TxLog.append(Seq((3L, "b2")).toDF("k", "v"), t)
    val feed = TxLog.readAppendsSince(spark, t, base)
    assert(feed.as[(Long, String)].collect().toSet ==
      Set((2L, "b1"), (3L, "b2")))
    // the feed plans only the appended files, not the base files
    assert(feed.inputFiles.length ==
      TxLog.read(spark, t).inputFiles.length -
        TxLog.readAsOf(spark, t, base).inputFiles.length)
    // from a mid version: only the later batch
    assert(TxLog.readAppendsSince(spark, t, mid).as[(Long, String)]
      .collect().toSet == Set((3L, "b2")))
    // from the latest version: empty, schema intact
    val empty = TxLog.readAppendsSince(spark, t, mid + 1)
    assert(empty.count() == 0 && empty.columns.toSeq == Seq("k", "v"))
  }

  // -------------------------------------------------------------------
  // Multi-column skipping over a z-ordered layout
  // -------------------------------------------------------------------

  test("readWhere prunes on two dimensions of a z-ordered table") {
    val t = tmpTable()
    val grid = for { x <- 0 until 32; y <- 0 until 32 }
      yield (x.toLong, y.toLong, s"$x/$y")
    val (clustered, _) = Layout.zOrdered(grid.toDF("x", "y", "v"), "x", "y", 16)
    TxLog.overwrite(clustered, t)
    val all = TxLog.read(spark, t).inputFiles.length
    assert(all == 16)
    // a 4x4 query box on a 32x32 grid: single-dim pruning keeps most
    // files (every x-stripe spans many y), the CONJUNCTION over the
    // z-ordered boxes keeps only the curve cells the box touches
    val box = TxLog.readWhere(spark, t,
      Seq(("x", Some(3L), Some(6L)), ("y", Some(3L), Some(6L))))
    assert(box.inputFiles.length <= 4,
      s"expected <=4 of $all files for a 4x4 box, planned ${box.inputFiles.length}")
    assert(box.count() == 16)
    assert(box.select("x").as[Long].collect().forall(x => x >= 3 && x <= 6))
  }

  // -------------------------------------------------------------------
  // Concurrent writers (the optimistic-commit claims, exercised)
  // -------------------------------------------------------------------

  test("racing appends from many threads all land exactly once, versions contiguous") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val t = tmpTable()
    TxLog.overwrite(Seq((0L, "seed")).toDF("k", "v"), t)
    val writers = (1 to 8).map { w =>
      Future {
        (1 to 4).foreach { i =>
          TxLog.append(Seq((w * 100L + i, s"w$w-$i")).toDF("k", "v"), t)
        }
      }
    }
    Await.result(Future.sequence(writers), 300.seconds)
    // 1 overwrite + 32 appends, every commit a distinct version
    assert(TxLog.versions(spark, t) == (1L to 33L))
    val rows = TxLog.read(spark, t).as[(Long, String)].collect()
    assert(rows.length == 33, "a lost commit race dropped rows")
    assert(rows.map(_._1).distinct.length == 33, "a double-publish duplicated rows")
  }

  test("racing merges on disjoint keys both apply (CAS recompute, no lost update)") {
    import org.apache.spark.sql.functions.col
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, 0.0), (2L, 0.0)).toDF("k", "bal"), t)
    def mergeOne(k: Long, bal: Double) = Future {
      TxLog.merge(spark, t,
        Seq((k, bal, "U", 1)).toDF("k", "bal", "op", "seq"),
        keys = Seq("k"), ordering = Seq(col("seq").desc), opCol = "op")
    }
    Await.result(Future.sequence(Seq(mergeOne(1L, 11.0), mergeOne(2L, 22.0))),
      300.seconds)
    // had the loser published its stale snapshot, the winner's update
    // would have been silently reverted
    assert(TxLog.read(spark, t).as[(Long, Double)].collect().toSet ==
      Set((1L, 11.0), (2L, 22.0)))
  }

  // -------------------------------------------------------------------
  // Row-level change data feed
  // -------------------------------------------------------------------

  test("readChangeFeed emits inserts, delete pre-images, and update pre/post pairs") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val t = tmpTable()
    val v0 = TxLog.overwrite(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), t)
    TxLog.append(Seq((4L, "d")).toDF("k", "v"), t)
    TxLog.delete(spark, t, col("k") === 2L, changeFeed = true)
    TxLog.update(spark, t, col("k") === 3L,
      Seq("v" -> concat(col("v"), lit("!"))), changeFeed = true)
    val feed = TxLog.readChangeFeed(spark, t, v0)
      .select("k", "v", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    assert(feed == Set(
      (4L, "d", "insert", 2L),
      (2L, "b", "delete", 3L),
      (3L, "c", "update_preimage", 4L),
      (3L, "c!", "update_postimage", 4L)))
    // folding the feed into the v0 snapshot reproduces the live table:
    // the exactness property an incremental materialization relies on
    val folded = TxLog.readAsOf(spark, t, v0).as[(Long, String)].collect().toSet ++
      feed.collect { case (k, v, "insert" | "update_postimage", _) => (k, v) } --
      feed.collect { case (k, v, "delete" | "update_preimage", _) => (k, v) }
    assert(folded == TxLog.read(spark, t).as[(Long, String)].collect().toSet)
  }

  test("delete pre-images cover tier-2 whole-file drops, not just rewrites") {
    import org.apache.spark.sql.functions.{col, lit}
    val t = rangedTable() // 4 disjoint decade files, k 0..39
    TxLog.delete(spark, t, col("k") < lit(15L), changeFeed = true)
    // 0..9 dropped whole (never rewritten) + 10..14 from the boundary
    // rewrite: ALL 15 pre-images must be in the feed regardless of tier
    val feed = TxLog.readChangeFeed(spark, t, 1L)
    assert(feed.filter(col("_change_type") === "delete")
      .select("k").as[Long].collect().sorted.toSeq == (0L to 14L))
  }

  test("readChangeFeed refuses rewrites and DML without recorded changes") {
    import org.apache.spark.sql.functions.col
    val t = tmpTable()
    val v0 = TxLog.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    TxLog.delete(spark, t, col("k") === 1L) // changeFeed not requested
    val e1 = intercept[RuntimeException] { TxLog.readChangeFeed(spark, t, v0) }
    assert(e1.getMessage.contains("no recorded change data"), e1.getMessage)
    TxLog.overwrite(Seq((9L, "z")).toDF("k", "v"), t)
    val e2 = intercept[RuntimeException] { TxLog.readChangeFeed(spark, t, v0) }
    assert(e2.getMessage.contains("no recorded change data"), e2.getMessage)
    // an empty range returns an empty, correctly-typed frame
    val latest = TxLog.latestVersion(spark, t).get
    val empty = TxLog.readChangeFeed(spark, t, latest)
    assert(empty.count() == 0 &&
      empty.columns.toSeq == Seq("k", "v", "_change_type", "_commit_version"))
  }

  test("vacuum reaps dropped versions' change-data files too") {
    import org.apache.spark.sql.functions.col
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    TxLog.delete(spark, t, col("k") === 1L, changeFeed = true)
    val cdfRel = TxLog.manifest(spark, t).cdf.get
    TxLog.overwrite(Seq((9L, "z")).toDF("k", "v"), t)
    val deleted = TxLog.vacuum(spark, t, keepVersions = 1)
    val root = new java.io.File(t)
    cdfRel.foreach { rel =>
      assert(deleted.contains(rel), s"cdf file $rel not vacuumed")
      assert(!new java.io.File(root, rel).exists(), rel)
    }
  }

  // -------------------------------------------------------------------
  // RESTORE
  // -------------------------------------------------------------------

  test("restore rolls the table back as a new commit; history keeps the bad versions") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t) // v1
    TxLog.append(Seq((3L, "c")).toDF("k", "v"), t)               // v2
    TxLog.overwrite(Seq((9L, "bad")).toDF("k", "v"), t)          // v3
    val v4 = TxLog.restore(spark, t, 2L)
    assert(v4 == 4L)
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // the bad version is still auditable, not rewritten away
    assert(TxLog.readAsOf(spark, t, 3L).as[(Long, String)].collect().toSeq ==
      Seq((9L, "bad")))
    assert(TxLog.history(spark, t).select("version", "action")
      .as[(Long, String)].collect().toMap.apply(4L) == "restore")
    // restore re-references v2's files: zero new data files were written
    assert(TxLog.filesAt(spark, t, 4L).toSet ==
      TxLog.filesAt(spark, t, 2L).toSet)
    // life goes on: a further append builds on the restored state
    TxLog.append(Seq((4L, "d")).toDF("k", "v"), t)
    assert(TxLog.read(spark, t).count() == 4)
  }

  test("vacuum keeps files a restore version re-references") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "keep")).toDF("k", "v"), t) // v1
    TxLog.overwrite(Seq((9L, "bad")).toDF("k", "v"), t)  // v2
    TxLog.restore(spark, t, 1L)                          // v3 -> v1's files
    // dropping v1 and v2 must NOT delete v1's files: v3 references them
    TxLog.vacuum(spark, t, keepVersions = 1)
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSeq ==
      Seq((1L, "keep")))
    val e = intercept[IllegalArgumentException] { TxLog.readAsOf(spark, t, 2L) }
    assert(e.getMessage.contains("no version 2"))
  }

  test("restore keeps txn watermarks: a replayed batch cannot double-land") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t)                 // v1
    TxLog.idempotentAppend(Seq((2L, "b")).toDF("k", "v"), t, "app", 7) // v2
    TxLog.restore(spark, t, 1L)                                        // v3
    // the restored TABLE predates batch 7, but the watermark must not:
    // replaying it after the restore would otherwise land it twice
    assert(TxLog.idempotentAppend(Seq((2L, "b")).toDF("k", "v"), t, "app", 7).isEmpty)
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSeq ==
      Seq((1L, "a")))
  }

  // -------------------------------------------------------------------
  // CHECK constraints
  // -------------------------------------------------------------------

  test("addConstraint validates existing rows and rejects violating tables") {
    import org.apache.spark.sql.functions.col
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, 10.0), (2L, -5.0)).toDF("k", "x"), t)
    val e = intercept[IllegalArgumentException] {
      TxLog.addConstraint(spark, t, "x_pos", "x > 0")
    }
    assert(e.getMessage.contains("existing rows violate"), e.getMessage)
    assert(TxLog.constraintsOf(spark, t).isEmpty)
    TxLog.delete(spark, t, col("x") <= 0)
    TxLog.addConstraint(spark, t, "x_pos", "x > 0")
    assert(TxLog.constraintsOf(spark, t) == Map("x_pos" -> "x > 0"))
    // duplicate names and unparseable expressions fail loudly
    intercept[IllegalArgumentException] {
      TxLog.addConstraint(spark, t, "x_pos", "x > 1")
    }
    intercept[Exception] {
      TxLog.addConstraint(spark, t, "broken", "not ) sql (")
    }
  }

  test("append/overwrite enforce constraints in-pass; NULL violates") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, 10.0)).toDF("k", "x"), t)
    TxLog.addConstraint(spark, t, "x_pos", "x > 0")
    TxLog.append(Seq((2L, 3.5)).toDF("k", "x"), t) // valid rows pass
    val e = intercept[Exception] {
      TxLog.append(Seq((3L, -1.0)).toDF("k", "x"), t)
    }
    assert(e.getMessage.contains("x_pos"), e.getMessage)
    // NULL is a violation (strict invariant, not SQL CHECK's null-passes)
    val eNull = intercept[Exception] {
      TxLog.append(Seq((4L, Option.empty[Double])).toDF("k", "x"), t)
    }
    assert(eNull.getMessage.contains("x_pos"), eNull.getMessage)
    // the failed appends left no partial state behind
    assert(TxLog.read(spark, t).as[(Long, Double)].collect().toSet ==
      Set((1L, 10.0), (2L, 3.5)))
    // overwrite keeps the constraint and enforces it on the new rows
    intercept[Exception] {
      TxLog.overwrite(Seq((9L, -9.0)).toDF("k", "x"), t)
    }
    assert(TxLog.constraintsOf(spark, t) == Map("x_pos" -> "x > 0"))
  }

  test("update enforces constraints on assignments; delete needs no check") {
    import org.apache.spark.sql.functions.{col, lit}
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "x"), t)
    TxLog.addConstraint(spark, t, "x_pos", "x > 0")
    val e = intercept[Exception] {
      TxLog.update(spark, t, col("k") === 1L, Seq("x" -> lit(-1.0)))
    }
    assert(e.getMessage.contains("x_pos"), e.getMessage)
    TxLog.update(spark, t, col("k") === 1L, Seq("x" -> lit(5.0)))
    TxLog.delete(spark, t, col("k") === 2L)
    assert(TxLog.read(spark, t).as[(Long, Double)].collect().toSet ==
      Set((1L, 5.0)))
  }

  test("merge enforces constraints on the merged result") {
    import org.apache.spark.sql.functions.col
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, 10.0)).toDF("k", "x"), t)
    TxLog.addConstraint(spark, t, "x_pos", "x > 0")
    val bad = Seq((1L, -4.0, "U", 1L)).toDF("k", "x", "op", "seq")
    intercept[Exception] {
      TxLog.merge(spark, t, bad, keys = Seq("k"),
        ordering = Seq(col("seq")), opCol = "op")
    }
    val good = Seq((1L, 4.0, "U", 1L)).toDF("k", "x", "op", "seq")
    TxLog.merge(spark, t, good, keys = Seq("k"),
      ordering = Seq(col("seq")), opCol = "op")
    assert(TxLog.read(spark, t).as[(Long, Double)].collect().toSet ==
      Set((1L, 4.0)))
  }

  test("dropConstraint re-allows; constraints travel with restore") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, 10.0)).toDF("k", "x"), t) // v1: no constraint
    TxLog.addConstraint(spark, t, "x_pos", "x > 0")    // v2
    TxLog.dropConstraint(spark, t, "x_pos")            // v3
    TxLog.append(Seq((2L, -1.0)).toDF("k", "x"), t)    // v4: allowed again
    intercept[IllegalArgumentException] {
      TxLog.dropConstraint(spark, t, "never_was")
    }
    // restore to v2 restores the constraint WITH the data
    TxLog.restore(spark, t, 2L)
    assert(TxLog.constraintsOf(spark, t) == Map("x_pos" -> "x > 0"))
    intercept[Exception] {
      TxLog.append(Seq((3L, -2.0)).toDF("k", "x"), t)
    }
  }

  // -------------------------------------------------------------------
  // Schema evolution + history
  // -------------------------------------------------------------------

  test("append(mergeSchema) adds columns; every file null-fills what it lacks") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t)
    // new column `score`: old files must read back NULL for it
    TxLog.append(Seq((2L, "b", 0.5)).toDF("k", "v", "score"), t,
      mergeSchema = true)
    val got = TxLog.read(spark, t)
    assert(got.columns.toSeq == Seq("k", "v", "score"))
    assert(got.as[(Long, String, Option[Double])].collect().toSet ==
      Set((1L, "a", None), (2L, "b", Some(0.5))))
    // an evolved append may also OMIT an old column: it null-fills
    TxLog.append(Seq((3L, 0.9)).toDF("k", "score"), t, mergeSchema = true)
    assert(TxLog.read(spark, t).as[(Long, Option[String], Option[Double])]
      .collect().toSet ==
      Set((1L, Some("a"), None), (2L, Some("b"), Some(0.5)),
        (3L, None, Some(0.9))))
    // time travel still plans v1 with v1's schema
    assert(TxLog.readAsOf(spark, t, 1L).columns.toSeq == Seq("k", "v"))
  }

  test("append(mergeSchema) rejects a same-name type conflict") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t)
    val e = intercept[IllegalArgumentException] {
      TxLog.append(Seq((2L, 3.5)).toDF("k", "v"), t, mergeSchema = true)
    }
    assert(e.getMessage.contains("type conflict"), e.getMessage)
  }

  test("skipping works on an evolved column for files that carry it") {
    import org.apache.spark.sql.functions.col
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v").coalesce(1), t)
    TxLog.append(Seq((2L, "b", 10L), (3L, "c", 20L)).toDF("k", "v", "score")
      .coalesce(1), t, mergeSchema = true)
    // the pre-evolution file has no score stats and no score values:
    // an all-NULL... actually it lacks the column entirely, so it has
    // no stats entry and must be KEPT (no evidence), then filtered out
    val got = TxLog.readBetween(spark, t, "score", Some(15L), None)
    assert(got.select(col("k")).as[Long].collect().toSeq == Seq(3L))
  }

  test("history lists one metadata row per version") {
    import org.apache.spark.sql.functions.col
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    TxLog.append(Seq((3L, "c")).toDF("k", "v"), t)
    TxLog.delete(spark, t, col("k") === 1L)
    val h = TxLog.history(spark, t)
      .select("version", "action", "rows").as[(Long, String, Option[Long])]
      .collect().toSeq
    assert(h.map(x => (x._1, x._2)) ==
      Seq((1L, "overwrite"), (2L, "append"), (3L, "delete")))
    assert(h.map(_._3) == Seq(Some(2L), Some(3L), Some(2L)))
  }

  test("readAppendsSince refuses non-append history") {
    import org.apache.spark.sql.functions.col
    val t = tmpTable()
    val base = TxLog.overwrite(Seq((1L, "base")).toDF("k", "v"), t)
    TxLog.append(Seq((2L, "b1")).toDF("k", "v"), t)
    // a delete rewrote history: the file-set diff is no longer a row diff
    TxLog.delete(spark, t, col("k") === 1L)
    val e = intercept[RuntimeException] {
      TxLog.readAppendsSince(spark, t, base)
    }
    assert(e.getMessage.contains("not an append"), e.getMessage)
  }

  test("statsAggregate answers count/min/max/nulls from the manifest alone") {
    val t = tmpTable()
    TxLog.overwrite(Seq(
      (Some(10L), "a"), (Some(3L), "b"), (None, "c")).toDF("k", "v")
      .repartition(2), t)
    TxLog.append(Seq((Some(42L), "d")).toDF("k", "v"), t)
    val got = TxLog.statsAggregate(spark, t, Seq("k", "v"))
      .as[(Long, Option[Long], Option[Long], Long, Option[String], Option[String], Long)]
      .head()
    assert(got == ((4L, Some(3L), Some(42L), 1L, Some("a"), Some("d"), 0L)))
    // THE metadata-only proof: physically delete every data file — the
    // aggregate still answers, because it never plans a scan
    val dataDir = java.nio.file.Paths.get(t, "data")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(dataDir).iterator().asScala.toSeq
      .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists)
    val after = TxLog.statsAggregate(spark, t, Seq("k"))
      .as[(Long, Option[Long], Option[Long], Long)].head()
    assert(after == ((4L, Some(3L), Some(42L), 1L)))
  }

  test("statsAggregate: empty table, bare count, and loud failures") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v").filter("k < 0"), t)
    assert(TxLog.statsAggregate(spark, t).as[Long].head() == 0L)
    TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    assert(TxLog.statsAggregate(spark, t).as[Long].head() == 2L)
    // unknown column and a column outside the stats domain fail loudly
    assertThrows[IllegalArgumentException] {
      TxLog.statsAggregate(spark, t, Seq("nope"))
    }
    val tb = tmpTable()
    TxLog.overwrite(Seq((1L, Array[Byte](1))).toDF("k", "b"), tb)
    assertThrows[IllegalArgumentException] {
      TxLog.statsAggregate(spark, tb, Seq("b"))
    }
    // a table with NO skippable columns still counts from metadata —
    // collectStats records row counts even with an empty stats domain
    val tb2 = tmpTable()
    TxLog.overwrite(Seq(Tuple1(Array[Byte](1, 2)), Tuple1(Array[Byte](3)))
      .toDF("b"), tb2)
    assert(TxLog.statsAggregate(spark, tb2).as[Long].head() == 2L)
  }
}
