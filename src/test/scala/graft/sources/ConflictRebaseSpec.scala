package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSpec

/** Logical conflict detection on the commit CAS: a DELETE/UPDATE that
  * loses the race to a commit which left its touched files alone —
  * a concurrent append, or DML on disjoint files — REBASES onto the
  * winner instead of recomputing, so both writers pay exactly one
  * compute. Conflicting overlap (same files, constraint changes)
  * still re-derives. Raced deterministically via TxLog.casRaceHook,
  * which fires once in the find→publish gap.
  */
class ConflictRebaseSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-rebase").resolve("t").toString

  private def publish100(t: String): Unit =
    TxLog.overwrite((0 until 100).map(i => (i.toLong, s"v$i", i % 10))
      .toDF("k", "v", "g").repartition(4, col("k")), t)

  /** Arm the hook to run `f` exactly once, then disarm itself. */
  private def once(f: => Unit): Unit =
    TxLog.casRaceHook = () => { TxLog.casRaceHook = () => (); f }

  // belt-and-braces: never leak an armed hook into another suite
  private def rtest(name: String)(body: => Unit): Unit =
    test(name)(try body finally { TxLog.casRaceHook = () => () })

  rtest("append racing a CoW delete: BOTH land with one compute each") {
    val t = tmpTable()
    publish100(t)
    once { TxLog.append(Seq((500L, "new", 99)).toDF("k", "v", "g"), t) }
    // maxAttempts = 1: without rebase, losing the CAS would throw
    val v = TxLog.delete(spark, t, col("g") === 3, maxAttempts = 1)
    val m = TxLog.manifest(spark, t)
    assert(m.version == v && m.action == "delete")
    assert(TxLog.latestVersion(spark, t).contains(3L)) // ow, append, delete
    val got = TxLog.read(spark, t).as[(Long, String, Int)].collect()
    assert(got.length == 91) // 100 - 10 deleted + 1 appended
    assert(!got.exists(_._3 == 3), "the delete applied")
    assert(got.exists(_._1 == 500L), "the concurrent append's row survived")
  }

  rtest("append racing a DV delete rebases and keeps exact vectors") {
    val t = tmpTable()
    publish100(t)
    once { TxLog.append(Seq((600L, "new", 99)).toDF("k", "v", "g"), t) }
    TxLog.delete(spark, t, col("g") === 7, deletionVectors = true,
      maxAttempts = 1)
    val m = TxLog.manifest(spark, t)
    assert(m.dvs.get.map(_.deleted).sum == 10L)
    val got = TxLog.read(spark, t).as[(Long, String, Int)].collect()
    assert(got.length == 91 && !got.exists(_._3 == 7))
    assert(got.exists(_._1 == 600L))
  }

  rtest("append racing an UPDATE (CoW and DV): appended rows unmodified") {
    val t = tmpTable()
    publish100(t)
    once { TxLog.append(Seq((700L, "keep", 1)).toDF("k", "v", "g"), t) }
    TxLog.update(spark, t, col("g") === 1 && col("k") < 100,
      Seq("v" -> lit("upd")), maxAttempts = 1)
    val got = TxLog.read(spark, t).as[(Long, String, Int)].collect()
    assert(got.length == 101)
    assert(got.count(_._2 == "upd") == 10)
    assert(got.find(_._1 == 700L).get._2 == "keep")
    // DV flavour on top
    once { TxLog.append(Seq((701L, "keep2", 2)).toDF("k", "v", "g"), t) }
    TxLog.update(spark, t, col("g") === 2 && col("k") < 100,
      Seq("v" -> lit("upd2")), deletionVectors = true, maxAttempts = 1)
    val got2 = TxLog.read(spark, t).as[(Long, String, Int)].collect()
    assert(got2.length == 102)
    assert(got2.count(_._2 == "upd2") == 10)
    assert(got2.find(_._1 == 701L).get._2 == "keep2")
  }

  rtest("file-disjoint DML rebases: two DV deletes on different partitions") {
    val t = tmpTable()
    TxLog.overwrite((0 until 100).map(i => (i.toLong, s"v$i", i % 4))
      .toDF("k", "v", "p"), t, partitionBy = Some(Seq("p")))
    // the winner deletes inside p=1's files; the loser touched only
    // p=2's — disjoint, so the loser rebases instead of recomputing
    once { TxLog.delete(spark, t, col("p") === 1 && col("k") < 50,
      deletionVectors = true) }
    TxLog.delete(spark, t, col("p") === 2 && col("k") < 50,
      deletionVectors = true, maxAttempts = 1)
    val got = TxLog.read(spark, t).as[(Long, String, Int)].collect()
    assert(got.length == 75) // 100 - 13 (p=1,k<50) - 12 (p=2,k<50)
    assert(!got.exists(r => r._1 < 50 && (r._3 == 1 || r._3 == 2)))
    assert(got.count(_._3 == 1) == 12 && got.count(_._3 == 2) == 13)
  }

  rtest("overlapping DML does NOT rebase: same-file conflict recomputes") {
    val t = tmpTable()
    publish100(t) // g spreads over every file: any two deletes overlap
    once { TxLog.delete(spark, t, col("g") === 5, deletionVectors = true) }
    val e = intercept[RuntimeException] {
      TxLog.delete(spark, t, col("g") === 6, deletionVectors = true,
        maxAttempts = 1)
    }
    assert(e.getMessage.contains("lost the commit race"))
    // with attempts to spare, the recompute lands both deletes exactly
    once { TxLog.delete(spark, t, col("g") === 7, deletionVectors = true) }
    TxLog.delete(spark, t, col("g") === 6, deletionVectors = true,
      maxAttempts = 2)
    val got = TxLog.read(spark, t).as[(Long, String, Int)].collect()
    assert(got.length == 70)
    assert(!got.exists(r => Set(5, 6, 7)(r._3)))
  }

  rtest("threaded: appends racing a DELETE all land, nothing lost") {
    val t = tmpTable()
    publish100(t)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val appends = (0 until 3).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long =
            TxLog.append(Seq((900L + i, s"t$i", 99)).toDF("k", "v", "g"), t)
        })
      }
      val del = pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long =
          TxLog.delete(spark, t, col("g") === 3 && col("k") < 100,
            deletionVectors = true, maxAttempts = 10)
      })
      appends.foreach(_.get())
      del.get()
    } finally pool.shutdown()
    val got = TxLog.read(spark, t).as[(Long, String, Int)].collect()
    assert(got.length == 93, s"100 - 10 deleted + 3 appended, got ${got.length}")
    assert(!got.exists(r => r._3 == 3 && r._1 < 100), "the delete applied")
    assert(Seq(900L, 901L, 902L).forall(k => got.exists(_._1 == k)),
      "every concurrent append survived")
  }

  rtest("append racing an OPTIMIZE: both land, the compaction never recomputes") {
    val t = tmpTable()
    publish100(t)
    TxLog.append(Seq((200L, "frag", 5)).toDF("k", "v", "g"), t) // fragment
    val planned = TxLog.manifest(spark, t).files.size
    once { TxLog.append(Seq((800L, "racer", 9)).toDF("k", "v", "g"), t) }
    // compact's compose recomposes onto the append's manifest inside the
    // SAME publish — data written once, no retry loop to re-enter
    val before = TxLog.dataWriteCount.get()
    val v = TxLog.compact(spark, t)
    // exactly TWO data writes total: the racer's append + the ONE
    // compaction rewrite (a recompute would make it three)
    assert(TxLog.dataWriteCount.get() - before == 2L,
      "the compaction must pay exactly one rewrite under the race")
    val m = TxLog.manifest(spark, t)
    assert(m.version == v && m.action == "compact")
    val got = TxLog.read(spark, t).as[(Long, String, Int)].collect()
    assert(got.length == 102, "compacted rows + both appends survive")
    assert(got.exists(_._1 == 800L), "the racing append's row survived")
    assert(m.files.size < planned, "the compaction actually packed files")
  }

  rtest("append racing OPTIMIZE ZORDER: both land with one compute each") {
    val t = tmpTable()
    publish100(t)
    once { TxLog.append(Seq((900L, "racer", 3)).toDF("k", "v", "g"), t) }
    val before = TxLog.dataWriteCount.get()
    val v = TxLog.zorderOptimize(spark, t, "k", "g", numFiles = 2)
    assert(TxLog.dataWriteCount.get() - before == 2L,
      "racer append + one zorder rewrite, never a recompute")
    val m = TxLog.manifest(spark, t)
    assert(m.version == v && m.action == "zorder")
    val got = TxLog.read(spark, t).as[(Long, String, Int)].collect()
    assert(got.length == 101)
    assert(got.exists(_._1 == 900L), "the racing append's row survived")
  }

  rtest("append racing REORG PURGE: both land with one compute each") {
    val t = tmpTable()
    publish100(t)
    TxLog.delete(spark, t, col("k") < 10L, deletionVectors = true)
    assert(TxLog.manifest(spark, t).dvs.exists(_.nonEmpty))
    once { TxLog.append(Seq((901L, "racer", 3)).toDF("k", "v", "g"), t) }
    val before = TxLog.dataWriteCount.get()
    val v = TxLog.purgeDvs(spark, t)
    assert(TxLog.dataWriteCount.get() - before == 2L,
      "racer append + one purge rewrite, never a recompute")
    val m = TxLog.manifest(spark, t)
    assert(m.version == v && m.action == "purge")
    assert(m.dvs.forall(_.isEmpty), "every vector materialized")
    val got = TxLog.read(spark, t).as[(Long, String, Int)].collect()
    assert(got.length == 91, "90 surviving rows + the racing append")
    assert(got.exists(_._1 == 901L), "the racing append's row survived")
  }

  rtest("a DV landing on a planned file aborts the OPTIMIZE loudly") {
    val t = tmpTable()
    publish100(t)
    TxLog.append(Seq((200L, "frag", 5)).toDF("k", "v", "g"), t)
    // the racer vectors rows INSIDE files the compaction planned to
    // rewrite: composing would shed the racer's vector and resurrect
    // its deleted rows — this is the one maintenance race that must
    // recompute, and it must say so rather than land wrong data
    once { TxLog.delete(spark, t, col("k") === 5L, deletionVectors = true) }
    intercept[java.util.ConcurrentModificationException] {
      TxLog.compact(spark, t)
    }
    // a re-run (fresh plan over the new snapshot) lands fine
    val v = TxLog.compact(spark, t)
    assert(TxLog.manifest(spark, t).version == v)
    assert(!TxLog.read(spark, t).as[(Long, String, Int)].collect()
      .exists(_._1 == 5L), "the racer's delete survived the compaction")
  }

  rtest("a concurrent addConstraint aborts the rebase (metadata conflict)") {
    val t = tmpTable()
    publish100(t)
    once { TxLog.addConstraint(spark, t, "g_ok", "g >= 0") }
    val e = intercept[RuntimeException] {
      TxLog.update(spark, t, col("g") === 4, Seq("v" -> lit("x")),
        maxAttempts = 1)
    }
    assert(e.getMessage.contains("lost the commit race"))
    // a recompute enforces the new constraint and lands
    TxLog.update(spark, t, col("g") === 4, Seq("v" -> lit("x")),
      maxAttempts = 2)
    assert(TxLog.read(spark, t).filter(col("v") === "x").count() == 10L)
    assert(TxLog.constraintsOf(spark, t).contains("g_ok"))
  }
}
