package graft.sources

import java.nio.file.Files
import java.util.concurrent.{Callable, Executors}

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Real-thread commit contention (no interposition hooks): many
  * writers race the optimistic CAS simultaneously and EVERY commit
  * must land — the linearizability the rename-if-absent primitive
  * plus the compose-retry loop promise. Deterministic assertions only
  * (row sets, contiguous version chain, per-writer ledger), never
  * timing.
  */
class CommitContentionSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-contention").resolve("t").toString

  test("24 appends from 4 threads all land on a contiguous chain") {
    val t = tmpTable()
    TxLog.overwrite(Seq((0L, "seed", 0)).toDF("k", "v", "g"), t)
    val pool = Executors.newFixedThreadPool(4)
    try {
      val futs = for (th <- 0 until 4; i <- 0 until 6) yield
        pool.submit(new Callable[Long] {
          def call(): Long = TxLog.append(
            Seq((100L * th + i, s"t$th-$i", th)).toDF("k", "v", "g"), t,
            mergeSchema = false)
        })
      futs.foreach(_.get())
    } finally pool.shutdown()
    val m = TxLog.manifest(spark, t)
    assert(m.version == 25L, "1 seed + 24 appends = version 25 exactly")
    assert(TxLog.versions(spark, t) == (1L to 25L),
      "the chain is contiguous — no version skipped or double-claimed")
    val keys = TxLog.read(spark, t).select("k").as[Long].collect().toSet
    val want = (for (th <- 0 until 4; i <- 0 until 6)
      yield 100L * th + i).toSet + 0L
    assert(keys == want, s"every racing append landed exactly once")
  }

  test("appends, DV deletes, and compactions race without losing rows") {
    val t = tmpTable()
    // 40 seed rows in 4 files, g in 0..3
    TxLog.overwrite((0L until 40L).map(k => (k, s"s$k", (k % 4).toInt))
      .toDF("k", "v", "g").repartitionByRange(4, col("k")), t)
    val pool = Executors.newFixedThreadPool(4)
    try {
      val appenders = for (th <- 0 until 2) yield
        pool.submit(new Callable[Unit] {
          def call(): Unit = (0 until 5).foreach { i =>
            TxLog.append(
              Seq((1000L + 10 * th + i, s"a$th-$i", 9)).toDF("k", "v", "g"), t)
          }
        })
      val deleter = pool.submit(new Callable[Unit] {
        def call(): Unit = (0 until 3).foreach { i =>
          // each delete targets a disjoint seed slice, never the appends
          TxLog.delete(spark, t, col("k") >= 10L * i && col("k") < 10L * i + 5,
            deletionVectors = true, maxAttempts = 20)
        }
      })
      val compactor = pool.submit(new Callable[Unit] {
        def call(): Unit = (0 until 2).foreach { _ =>
          try TxLog.compact(spark, t)
          catch { // losing every CAS to hot writers is a legal outcome
            case _: java.util.ConcurrentModificationException => ()
            case e: RuntimeException
              if e.getMessage != null && e.getMessage.contains("lost") => ()
          }
        }
      })
      appenders.foreach(_.get()); deleter.get(); compactor.get()
    } finally pool.shutdown()
    val got = TxLog.read(spark, t).as[(Long, String, Int)].collect()
    val gotKeys = got.map(_._1).toSet
    val deleted = (0 until 3).flatMap(i => 10L * i until 10L * i + 5).toSet
    val want = (0L until 40L).toSet -- deleted ++
      (for (th <- 0 until 2; i <- 0 until 5) yield 1000L + 10 * th + i)
    assert(gotKeys == want,
      s"missing=${(want -- gotKeys).take(5)} extra=${(gotKeys -- want).take(5)}")
    // the chain replays cleanly end to end (every delta resolves)
    TxLog.clearSnapshotCache()
    assert(TxLog.read(spark, t).count() == want.size.toLong)
  }
}
