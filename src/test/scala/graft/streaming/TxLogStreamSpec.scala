package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.sources.TxLog

/** The commit-log streaming source: offsets are TxLog versions, the
  * initial batch is the start snapshot, later batches are exactly the
  * appended files' rows, and restarts resume from the checkpointed
  * version.
  */
class TxLogStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-$tag").resolve("t").toString

  /** Drain the source with AvailableNow into a collector; returns the
    * (batchId, rows) pairs this RUN produced.
    */
  private def drain(table: String, checkpoint: String,
      ignoreChanges: Boolean = false): Seq[(Long, Set[(Long, String)])] = {
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[(Long, String)])]
    val reader = spark.readStream.format("graft-txlog").option("path", table)
    val q = (if (ignoreChanges) reader.option("ignoreChanges", "true") else reader)
      .load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val rows = batch.select("k", "v").as[(Long, String)].collect().toSet
        got.synchronized { got += ((id, rows)) }
        ()
      }
      .start()
    q.awaitTermination(120000)
    got.toSeq
  }

  test("initial snapshot, then only appended rows, resuming across restarts") {
    val t = tmp("txstream")
    val cp = Files.createTempDirectory("txstream-cp").toString
    TxLog.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)

    // run 1: the full snapshot arrives as one batch
    val run1 = drain(t, cp)
    assert(run1.map(_._2).reduce(_ ++ _) == Set((1L, "a"), (2L, "b")))

    // no new commits -> an immediate re-run emits nothing
    assert(drain(t, cp).flatMap(_._2).isEmpty)

    // two appends, one re-run from the same checkpoint: ONLY the new rows
    TxLog.append(Seq((3L, "c")).toDF("k", "v"), t)
    TxLog.append(Seq((4L, "d")).toDF("k", "v"), t)
    val run3 = drain(t, cp)
    assert(run3.map(_._2).reduce(_ ++ _) == Set((3L, "c"), (4L, "d")),
      s"expected only appended rows, got $run3")
  }

  test("the incremental batch plans only the appended files") {
    val t = tmp("txstream-files")
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t)
    val base = TxLog.latestVersion(spark, t).get
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t)
    // the same file set the source's appendedFiles walk would produce
    val feed = TxLog.readAppendsSince(spark, t, base)
    assert(feed.inputFiles.nonEmpty &&
      feed.inputFiles.length < TxLog.read(spark, t).inputFiles.length)
  }

  test("row-preserving commits never interrupt the stream (dataChange=false)") {
    val t = tmp("txstream-optimize")
    val cp = Files.createTempDirectory("txstream-opt-cp").toString
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t)
    drain(t, cp) // consume the snapshot
    // fragment, then a nightly OPTIMIZE plus metadata DDL land between
    // the stream's reads — none of them carries a row change
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t)
    TxLog.compact(spark, t)
    TxLog.setProperty(spark, t, "graft.note", "x")
    TxLog.append(Seq((3L, "c")).toDF("k", "v"), t)
    TxLog.addColumns(spark, t, Seq(org.apache.spark.sql.types.StructField(
      "extra", org.apache.spark.sql.types.LongType)))
    val got = drain(t, cp) // NO ignoreChanges — must not fail
    assert(got.map(_._2).fold(Set.empty[(Long, String)])(_ ++ _) ==
      Set((2L, "b"), (3L, "c")),
      s"only the appended rows, no phantom re-emits from the rewrite: $got")
    // the batch-side spelling walks the same per-version attribution
    val sinceAll = TxLog.readAppendsSince(spark, t, 1L)
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(sinceAll == Set((2L, "b"), (3L, "c")))
  }

  test("a schema-changing metadata commit still fails the fixed-schema stream") {
    val t = tmp("txstream-rename")
    val cp = Files.createTempDirectory("txstream-ren-cp").toString
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t)
    drain(t, cp)
    // a rename is row-preserving but re-labels the column the stream's
    // fixed schema selects — passing silently would null-fill it
    TxLog.renameColumn(spark, t, "v", "w")
    TxLog.append(Seq((2L, "b")).toDF("k", "w"), t)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(t, cp)
    }
    val msg = e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("schema changed"), s"unexpected failure: $msg")
  }

  /** Drain with schemaTrackingLocation set, collecting rows generically
    * (the serving schema may differ between runs).
    */
  private def drainTracked(table: String, checkpoint: String,
      tracking: String): Seq[Seq[Any]] = {
    val got = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val q = spark.readStream.format("graft-txlog").option("path", table)
      .option("schemaTrackingLocation", tracking)
      .load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.collect().map(_.toSeq.toList)
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    q.awaitTermination(120000)
    got.toSeq
  }

  test("schema tracking: ADD COLUMN, restart resumes with null-filled history") {
    val t = tmp("txstream-track-add")
    val cp = Files.createTempDirectory("txstream-ta-cp").toString
    val loc = Files.createTempDirectory("txstream-ta-loc").toString
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t)
    assert(drainTracked(t, cp, loc).toSet == Set(List(1L, "a")))
    // unprocessed pre-evolution append, then the evolution + new rows
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t)
    TxLog.addColumns(spark, t, Seq(org.apache.spark.sql.types.StructField(
      "extra", org.apache.spark.sql.types.LongType)))
    TxLog.append(Seq((3L, "c", 9L)).toDF("k", "v", "extra"), t)
    // restart: serves the EVOLVED schema; the pre-evolution file
    // null-fills the new column; nothing reprocesses
    val got = drainTracked(t, cp, loc).toSet
    assert(got == Set(List(2L, "b", null), List(3L, "c", 9L)),
      s"expected null-filled history + evolved rows, got $got")
  }

  test("schema tracking: a widen in range resumes; without tracking it fails") {
    val t = tmp("txstream-track-widen")
    val cp = Files.createTempDirectory("txstream-tw-cp").toString
    val loc = Files.createTempDirectory("txstream-tw-loc").toString
    TxLog.overwrite(Seq((1L, "a", 10)).toDF("k", "v", "x"), t)
    assert(drainTracked(t, cp, loc).toSet == Set(List(1L, "a", 10)))
    TxLog.append(Seq((2L, "b", 20)).toDF("k", "v", "x"), t) // unprocessed
    TxLog.alterColumnType(spark, t, "x",
      org.apache.spark.sql.types.LongType) // schema-changing: alter_column
    TxLog.append(Seq((3L, "c", 5L)).toDF("k", "v", "x"), t)
    // a restart WITHOUT tracking from the SAME checkpoint still fails
    // loudly on the in-range alter_column — the default contract (the
    // failed attempt commits no batch, so the position is unchanged)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(t, cp)
    }
    val msg0 = e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg0.contains("schema changed"), s"unexpected failure: $msg0")
    // the tracked restart resumes: the narrow pre-widen file promotes,
    // the post-widen rows arrive as committed
    val got = drainTracked(t, cp, loc).toSet
    assert(got == Set(List(2L, "b", 20L), List(3L, "c", 5L)),
      s"expected promoted + post-widen rows, got $got")
  }

  test("schema tracking refuses a rename at restart (fresh checkpoint remedy)") {
    val t = tmp("txstream-track-ren")
    val cp = Files.createTempDirectory("txstream-tr-cp").toString
    val loc = Files.createTempDirectory("txstream-tr-loc").toString
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t)
    drainTracked(t, cp, loc)
    TxLog.renameColumn(spark, t, "v", "w")
    TxLog.append(Seq((2L, "b")).toDF("k", "w"), t)
    val e = intercept[Exception] { drainTracked(t, cp, loc) }
    val msg = e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("cannot evolve"),
      s"a rename must refuse the tracked resume loudly: $msg")
  }

  test("a non-append commit fails the stream; ignoreChanges skips it") {
    import org.apache.spark.sql.functions.col
    val t = tmp("txstream-rewrite")
    val cp = Files.createTempDirectory("txstream-rw-cp").toString
    TxLog.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    drain(t, cp) // consume the snapshot

    TxLog.delete(spark, t, col("k") === 1L) // history is no longer append-only
    TxLog.append(Seq((3L, "c")).toDF("k", "v"), t)

    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(t, cp)
    }
    assert(e.getMessage.contains("not an append") ||
      Option(e.getCause).exists(_.getMessage.contains("not an append")),
      s"unexpected failure: ${e.getMessage}")

    // the escape hatch: the delete's rewrites produce no rows, the
    // append after it still arrives
    val got = drain(t, cp, ignoreChanges = true)
    assert(got.map(_._2).fold(Set.empty[(Long, String)])(_ ++ _) ==
      Set((3L, "c")), s"got $got")
  }

  /** Drain the CDF stream with AvailableNow; returns all
    * (k, v, _change_type, _commit_version) rows this run produced.
    */
  private def drainCdf(table: String, checkpoint: String,
      ignoreChanges: Boolean = false): Set[(Long, String, String, Long)] = {
    val got = scala.collection.mutable.Set.empty[(Long, String, String, Long)]
    val reader = spark.readStream.format("graft-txlog").option("path", table)
      .option("readChangeFeed", "true")
    val q = (if (ignoreChanges) reader.option("ignoreChanges", "true") else reader)
      .load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.select("k", "v", "_change_type", "_commit_version")
          .as[(Long, String, String, Long)].collect()
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    q.awaitTermination(120000)
    got.toSet
  }

  test("readChangeFeed streams row-level changes; maintenance commits emit nothing") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val t = tmp("txcdf")
    val cp = Files.createTempDirectory("txcdf-cp").toString
    TxLog.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t) // v1

    // the initial batch is the snapshot AS inserts at its version
    assert(drainCdf(t, cp) ==
      Set((1L, "a", "insert", 1L), (2L, "b", "insert", 1L)))

    TxLog.append(Seq((3L, "c")).toDF("k", "v"), t)                // v2
    TxLog.compact(spark, t)                                       // v3: row-preserving
    TxLog.delete(spark, t, col("k") === 1L, changeFeed = true)    // v4
    TxLog.update(spark, t, col("k") === 3L,
      Seq("v" -> concat(col("v"), lit("!"))), changeFeed = true)  // v5

    // appends arrive as inserts from only their files, the compaction
    // contributes NOTHING (its rewrite preserves every row), recorded
    // DML arrives as pre/post images — all tagged with their commit
    assert(drainCdf(t, cp) == Set(
      (3L, "c", "insert", 2L),
      (1L, "a", "delete", 4L),
      (3L, "c", "update_preimage", 5L),
      (3L, "c!", "update_postimage", 5L)))

    // an unrecorded rewrite fails the stream loudly ...
    TxLog.overwrite(Seq((9L, "z")).toDF("k", "v"), t)             // v6
    TxLog.append(Seq((4L, "d")).toDF("k", "v"), t)                // v7
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainCdf(t, cp)
    }
    assert(e.getMessage.contains("no recorded change data") ||
      Option(e.getCause).exists(_.getMessage.contains("no recorded change data")),
      s"unexpected failure: ${e.getMessage}")
    // ... and ignoreChanges skips it while later commits still arrive
    assert(drainCdf(t, cp, ignoreChanges = true) ==
      Set((4L, "d", "insert", 7L)))
  }

  test("a general MERGE with changeFeed streams its row-level changes") {
    import org.apache.spark.sql.functions.expr
    import TxLog.{MergeDelete, MergeInsert, MergeUpdate}
    val t = tmp("txcdf-merge")
    val cp = Files.createTempDirectory("txcdf-merge-cp").toString
    TxLog.overwrite(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), t) // v1
    drainCdf(t, cp) // consume the snapshot batch
    TxLog.mergeInto(spark, t, Seq((2L, "B"), (3L, "DEL"), (9L, "I"))
        .toDF("k", "sv"),
      on = expr("t.k = s.k"),
      matched = Seq(
        MergeDelete(cond = Some(expr("s.sv = 'DEL'"))),
        MergeUpdate(Map("v" -> expr("s.sv")))),
      notMatched = Seq(MergeInsert(Map("k" -> expr("s.k"),
        "v" -> expr("s.sv")))),
      changeFeed = true)                                                    // v2
    assert(drainCdf(t, cp) == Set(
      (2L, "b", "update_preimage", 2L),
      (2L, "B", "update_postimage", 2L),
      (3L, "c", "delete", 2L),
      (9L, "I", "insert", 2L)))
  }

  test("deletion-vector DML streams through the change feed like a rewrite") {
    import org.apache.spark.sql.functions.{col, lit}
    val t = tmp("txcdfdv")
    val cp = Files.createTempDirectory("txcdfdv-cp").toString
    // one file, so neither DML empties a file (that would whole-drop it
    // instead of vectoring — a different, also-correct path)
    TxLog.overwrite(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").coalesce(1), t)
    assert(drainCdf(t, cp) == Set(
      (1L, "a", "insert", 1L), (2L, "b", "insert", 1L),
      (3L, "c", "insert", 1L)))
    // vectored DML rewrites nothing, but its recorded feed is identical
    // to the copy-on-write paths' — downstream consumers can't tell
    val files = TxLog.manifest(spark, t).files.toSet
    TxLog.delete(spark, t, col("k") === 1L,
      deletionVectors = true, changeFeed = true)                  // v2
    TxLog.update(spark, t, col("k") === 3L, Seq("v" -> lit("c!")),
      deletionVectors = true, changeFeed = true)                  // v3
    assert(files.subsetOf(TxLog.manifest(spark, t).files.toSet))
    assert(drainCdf(t, cp) == Set(
      (1L, "a", "delete", 2L),
      (3L, "c", "update_preimage", 3L),
      (3L, "c!", "update_postimage", 3L)))
  }

  test("format(graft-txlog) sink appends exactly once and Complete overwrites") {
    val src = tmp("txsink-src")
    val dst = tmp("txsink-dst")
    TxLog.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), src)

    def run(checkpoint: String): Unit = {
      val q = spark.readStream.format("graft-txlog").option("path", src).load()
        .writeStream.format("graft-txlog")
        .option("path", dst)
        .option("txnAppId", "sink-spec") // stable across checkpoint wipes
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      ()
    }

    val cp = Files.createTempDirectory("txsink-cp1").toString
    run(cp)
    assert(TxLog.read(spark, dst).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    // wiped checkpoint: batch 0 replays under the same txnAppId -> no dupes
    run(Files.createTempDirectory("txsink-cp2").toString)
    assert(TxLog.read(spark, dst).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")), "replay must not double-append")
    // normal restart on the original checkpoint: the appended row
    // arrives as the NEXT batch id and lands once
    TxLog.append(Seq((3L, "c")).toDF("k", "v"), src)
    run(cp)
    assert(TxLog.read(spark, dst).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("autoCompactMinFiles keeps a fragmenting ingest's file count bounded") {
    val src = tmp("txac-src")
    val dst = tmp("txac-dst")
    TxLog.overwrite(Seq((0L, "seed")).toDF("k", "v"), src)

    // one checkpoint across restarts: each run's batch gets the NEXT
    // id, so the idempotent watermark admits it (a fresh checkpoint
    // would restart ids at 0 and the sink would rightly skip them)
    val cp = Files.createTempDirectory("txac-cp").toString
    def run(): Unit = {
      val q = spark.readStream.format("graft-txlog").option("path", src).load()
        .writeStream.format("graft-txlog")
        .option("path", dst)
        .option("txnAppId", "ac-spec")
        .option("checkpointLocation", cp)
        .option("autoCompactMinFiles", "4")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      ()
    }

    // 6 tiny append commits through the streaming sink: without the
    // trigger each leaves its own small files behind
    run()
    (1 to 6).foreach { i =>
      TxLog.append(Seq((i.toLong, s"b$i")).toDF("k", "v"), src)
      run()
    }
    val m = TxLog.manifest(spark, dst)
    assert(m.files.size < 4,
      s"auto-compaction left ${m.files.size} files")
    // the compactions are ordinary row-preserving commits in history
    assert(TxLog.history(spark, dst)
      .filter(org.apache.spark.sql.functions.col("action") === "compact")
      .count() >= 1L)
    // and exactly-once ingestion survived them
    assert(TxLog.read(spark, dst).as[(Long, String)].collect().toSet ==
      (Set((0L, "seed")) ++ (1 to 6).map(i => (i.toLong, s"b$i"))))
  }

  test("CDF-driven replication: streaming the feed into merge rebuilds the table") {
    // the Delta CDC replication recipe end-to-end: table A's change feed
    // streamed and folded into replica B through the CDC merge fast path
    // — after any mix of DML on A, B converges to A's live rows. This is
    // the strongest statement that the feed is COMPLETE: a missing or
    // double-counted change would leave the replica divergent.
    import org.apache.spark.sql.functions.{col, expr, lit, when}
    import TxLog.{MergeDelete, MergeInsert, MergeUpdate}
    val a = tmp("txrepl-a"); val b = tmp("txrepl-b")
    TxLog.overwrite(Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("k", "v", "n"), a)
    TxLog.overwrite(Seq.empty[(Long, String, Int)].toDF("k", "v", "n"), b)

    def replicate(cp: String): Unit = {
      val q = spark.readStream.format("graft-txlog").option("path", a)
        .option("readChangeFeed", "true").load()
        .writeStream
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          // preimages carry no new state; deletes become 'D' ops and the
          // CDC merge keeps the LATEST change per key by commit version
          val changes = batch
            .filter(col("_change_type") =!= "update_preimage")
            .withColumn("op",
              when(col("_change_type") === "delete", "D").otherwise("U"))
          if (!changes.isEmpty)
            TxLog.merge(spark, b, changes.drop("_change_type"),
              keys = Seq("k"),
              ordering = Seq(col("_commit_version").desc),
              opCol = "op")
          ()
        }
        .start()
      q.awaitTermination(120000)
      ()
    }

    // ONE checkpoint across runs — the incremental-continuation shape a
    // real replication pipeline has (a FRESH checkpoint re-baselines
    // from the current snapshot, which by design cannot retract a
    // replica's stale rows; re-baselining requires truncating B first)
    val cp = Files.createTempDirectory("txrepl-cp").toString
    replicate(cp)
    def live(t: String): Set[(Long, String, Int)] =
      TxLog.read(spark, t).select("k", "v", "n")
        .as[(Long, String, Int)].collect().toSet
    assert(live(b) == live(a), "replica diverged after the snapshot batch")

    // a mixed-DML day on A: append, DV delete, update, general merge
    TxLog.append(Seq((4L, "d", 40)).toDF("k", "v", "n"), a)
    TxLog.delete(spark, a, col("k") === 1L, changeFeed = true,
      deletionVectors = true)
    TxLog.update(spark, a, col("k") === 2L,
      Seq("n" -> (col("n") + 5)), changeFeed = true)
    TxLog.mergeInto(spark, a, Seq((3L, "C3"), (9L, "I")).toDF("k", "sv"),
      on = expr("t.k = s.k"),
      matched = Seq(MergeUpdate(Map("v" -> expr("s.sv")))),
      notMatched = Seq(MergeInsert(Map("k" -> expr("s.k"),
        "v" -> expr("s.sv"), "n" -> lit(0)))),
      changeFeed = true)

    replicate(cp) // continue from the same checkpoint: only new changes
    assert(live(b) == live(a),
      s"replica diverged: b=${live(b)} a=${live(a)}")
    assert(live(a) == Set((2L, "b", 25), (3L, "C3", 30), (4L, "d", 40),
      (9L, "I", 0)))
  }

  test("Update-mode sink upserts by mergeKeys, exactly once") {
    val src = tmp("txup-src"); val dst = tmp("txup-dst")
    TxLog.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), src)
    val cp = Files.createTempDirectory("txup-cp").toString
    def run(): Unit = {
      val q = spark.readStream.format("graft-txlog").option("path", src).load()
        .writeStream.format("graft-txlog")
        .option("path", dst).option("txnAppId", "upserter")
        .option("mergeKeys", "k")
        .option("checkpointLocation", cp)
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      ()
    }
    run()
    def rows(t: String): Set[(Long, String)] =
      TxLog.read(spark, t).as[(Long, String)].collect().toSet
    assert(rows(dst) == Set(1L -> "a", 2L -> "b"))
    // CDC-style day 2: new state for an existing key + a new key arrive
    // as APPENDS on the source; the sink must UPSERT, not append
    TxLog.append(Seq((2L, "B2"), (3L, "c")).toDF("k", "v"), src)
    run()
    assert(rows(dst) == Set(1L -> "a", 2L -> "B2", 3L -> "c"),
      s"got ${rows(dst)}")
    // wiped checkpoint: batch ids restart and the snapshot replays —
    // the sink-side watermark must absorb it without double-applying
    val cp2 = Files.createTempDirectory("txup-cp2").toString
    val q2 = spark.readStream.format("graft-txlog").option("path", src).load()
      .writeStream.format("graft-txlog")
      .option("path", dst).option("txnAppId", "upserter")
      .option("mergeKeys", "k")
      .option("checkpointLocation", cp2)
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination(120000)
    assert(rows(dst) == Set(1L -> "a", 2L -> "B2", 3L -> "c"))
  }

  test("exactly-once table-to-table pipe survives a checkpoint wipe") {
    val src = tmp("txpipe-src")
    val dst = tmp("txpipe-dst")
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), src)
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v").limit(0), dst)

    def pipe(checkpoint: String): Unit = {
      val q = spark.readStream.format("graft-txlog").option("path", src).load()
        .writeStream
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          TxLog.idempotentAppend(batch, dst, appId = "txpipe", batchId = id)
          ()
        }
        .start()
      q.awaitTermination(120000)
      ()
    }

    pipe(Files.createTempDirectory("txpipe-cp1").toString)
    // a WIPED checkpoint restarts batch ids at 0 and re-delivers the
    // snapshot — the classic at-least-once replay; the sink-side
    // (appId, batchId) watermark must absorb it
    pipe(Files.createTempDirectory("txpipe-cp2").toString)
    assert(TxLog.read(spark, dst).as[(Long, String)].collect().toSeq ==
      Seq((1L, "a")), "replayed snapshot must not double-append")
  }

  private def drainOpts(table: String, checkpoint: String,
      opts: Map[String, String]): Seq[(Long, Set[(Long, String)])] = {
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[(Long, String)])]
    val reader = opts.foldLeft(
      spark.readStream.format("graft-txlog").option("path", table)) {
      case (r, (k, v)) => r.option(k, v) }
    val q = reader.load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val rows = batch.select("k", "v").as[(Long, String)].collect().toSet
        got.synchronized { got += ((id, rows)) }
        ()
      }
      .start()
    q.awaitTermination(120000)
    got.toSeq
  }

  test("maxVersionsPerTrigger paces a catch-up backlog into bounded batches") {
    val t = tmp("txstream-paced")
    val cp = Files.createTempDirectory("txstream-paced-cp").toString
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t)
    drainOpts(t, cp, Map("maxVersionsPerTrigger" -> "1")) // snapshot
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t)
    TxLog.append(Seq((3L, "c")).toDF("k", "v"), t)
    TxLog.append(Seq((4L, "d")).toDF("k", "v"), t)
    val run = drainOpts(t, cp, Map("maxVersionsPerTrigger" -> "1"))
    val nonEmpty = run.filter(_._2.nonEmpty)
    assert(nonEmpty.map(_._2).reduce(_ ++ _) ==
      Set((2L, "b"), (3L, "c"), (4L, "d")), s"all rows must arrive: $run")
    assert(nonEmpty.size == 3,
      s"3-version backlog at cap 1 must drain as 3 batches, got $run")
    // uncapped: the same backlog shape arrives as ONE batch
    val t2 = tmp("txstream-unpaced")
    val cp2 = Files.createTempDirectory("txstream-unpaced-cp").toString
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t2)
    drainOpts(t2, cp2, Map.empty)
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t2)
    TxLog.append(Seq((3L, "c")).toDF("k", "v"), t2)
    val run2 = drainOpts(t2, cp2, Map.empty).filter(_._2.nonEmpty)
    assert(run2.size == 1 && run2.head._2 == Set((2L, "b"), (3L, "c")))
  }

  test("maxBytesPerTrigger paces the backlog by ADDED data bytes") {
    val t = tmp("txstream-bytes")
    val cp = Files.createTempDirectory("txstream-bytes-cp").toString
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t)
    drainOpts(t, cp, Map.empty) // consume the snapshot
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t)
    TxLog.append(Seq((3L, "c")).toDF("k", "v"), t)
    TxLog.append(Seq((4L, "d")).toDF("k", "v"), t)
    // each parquet append is hundreds of bytes: a 1-byte budget admits
    // exactly one version per batch (soft cap — the first always lands)
    val run = drainOpts(t, cp, Map("maxBytesPerTrigger" -> "1"))
      .filter(_._2.nonEmpty)
    assert(run.map(_._2).reduce(_ ++ _) ==
      Set((2L, "b"), (3L, "c"), (4L, "d")), s"all rows must arrive: $run")
    assert(run.size == 3,
      s"3-version backlog at 1 byte/trigger must drain as 3 batches: $run")
    // a budget larger than the whole backlog drains it in one batch
    val t2 = tmp("txstream-bytes2")
    val cp2 = Files.createTempDirectory("txstream-bytes2-cp").toString
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t2)
    drainOpts(t2, cp2, Map.empty)
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t2)
    TxLog.append(Seq((3L, "c")).toDF("k", "v"), t2)
    val run2 = drainOpts(t2, cp2,
      Map("maxBytesPerTrigger" -> (64L << 20).toString)).filter(_._2.nonEmpty)
    assert(run2.size == 1 && run2.head._2 == Set((2L, "b"), (3L, "c")))
  }

  test("maxFilesPerTrigger paces the backlog by ADDED file count") {
    val t = tmp("txstream-files")
    val cp = Files.createTempDirectory("txstream-files-cp").toString
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t)
    drainOpts(t, cp, Map.empty) // consume the snapshot
    // each append lands 2 files; a cap of 2 admits one version per batch
    TxLog.append(Seq((2L, "b"), (3L, "c")).toDF("k", "v").repartition(2), t)
    TxLog.append(Seq((4L, "d"), (5L, "e")).toDF("k", "v").repartition(2), t)
    val run = drainOpts(t, cp, Map("maxFilesPerTrigger" -> "2"))
      .filter(_._2.nonEmpty)
    assert(run.map(_._2).reduce(_ ++ _) ==
      Set((2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")))
    assert(run.size == 2,
      s"2-version/4-file backlog at 2 files/trigger must drain as 2 batches: $run")
  }

  test("startingVersion streams changes after v with no initial snapshot") {
    val t = tmp("txstream-startv")
    val cp = Files.createTempDirectory("txstream-startv-cp").toString
    TxLog.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    val v = TxLog.latestVersion(spark, t).get
    TxLog.append(Seq((3L, "c")).toDF("k", "v"), t)
    val run = drainOpts(t, cp, Map("startingVersion" -> v.toString))
      .filter(_._2.nonEmpty)
    assert(run.flatMap(_._2).toSet == Set((3L, "c")),
      s"only post-v rows, no snapshot: $run")
    // startingVersion == latest: nothing yet; a later append arrives
    val t2 = tmp("txstream-startv2")
    val cp2 = Files.createTempDirectory("txstream-startv2-cp").toString
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t2)
    val v2 = TxLog.latestVersion(spark, t2).get
    assert(drainOpts(t2, cp2,
      Map("startingVersion" -> v2.toString)).flatMap(_._2).isEmpty)
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t2)
    assert(drainOpts(t2, cp2, Map("startingVersion" -> v2.toString))
      .flatMap(_._2).toSet == Set((2L, "b")))
  }
}
