package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** TxLog.merge rewrites ONLY the files holding matched keys — the
  * O(touched + changes) Delta merge shape, not an O(table) rewrite.
  */
class MergeTouchedSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-merget").resolve("t").toString

  test("merge rewrites only touched files; untouched survive by identity") {
    val t = tmpTable()
    TxLog.overwrite((0L until 200L).map(i => (i, s"v$i", 1))
      .toDF("k", "v", "n").repartition(8, col("k")), t)
    val before = TxLog.manifest(spark, t).files.toSet
    // a change batch touching 3 keys + inserting 1 new key
    val changes = Seq(
      (5L, "upd5", 2, "U", 1L), (77L, "upd77", 2, "U", 1L),
      (123L, "", 0, "D", 1L), (9999L, "new", 7, "U", 1L))
      .toDF("k", "v", "n", "op", "seq")
    TxLog.merge(spark, t, changes, keys = Seq("k"),
      ordering = Seq(col("seq").desc), opCol = "op")
    val after = TxLog.manifest(spark, t).files.toSet
    val survived = before.intersect(after)
    // 3 matched keys live in at most 3 of the 8 files; at least 5 files
    // must survive the merge untouched (by path identity)
    assert(survived.size >= 5,
      s"only ${survived.size} of 8 files survived an O(touched) merge")
    assert(survived.size < 8, "at least one file must have been rewritten")
    // semantics: equal to a from-scratch cdcApply over the whole table
    val got = TxLog.read(spark, t).as[(Long, String, Int)].collect().toSet
    assert(got.size == 200) // 200 - 1 delete + 1 insert
    assert(got.contains((5L, "upd5", 2)) && got.contains((77L, "upd77", 2)))
    assert(got.contains((9999L, "new", 7)))
    assert(!got.exists(_._1 == 123L))
    assert(got.contains((6L, "v6", 1))) // untouched rows intact
  }

  test("merge into a table with deletion vectors respects and keeps them") {
    val t = tmpTable()
    TxLog.overwrite((0L until 100L).map(i => (i, s"v$i", 1))
      .toDF("k", "v", "n").repartition(4, col("k")), t)
    TxLog.delete(spark, t, col("k") < 10L, deletionVectors = true)
    // merge a key that was DV-deleted: it must come back as an INSERT
    // (it is not live), and untouched files keep their vectors
    val changes = Seq((3L, "reborn", 9, "U", 1L))
      .toDF("k", "v", "n", "op", "seq")
    TxLog.merge(spark, t, changes, keys = Seq("k"),
      ordering = Seq(col("seq").desc), opCol = "op")
    val got = TxLog.read(spark, t).as[(Long, String, Int)].collect().toSet
    assert(got.contains((3L, "reborn", 9)))
    assert(!got.exists(r => r._1 < 10 && r._1 != 3L))
    assert(got.size == 91)
  }

  test("all-new-key merge appends without touching any file") {
    val t = tmpTable()
    TxLog.overwrite((0L until 50L).map(i => (i, s"v$i", 1))
      .toDF("k", "v", "n").repartition(4, col("k")), t)
    val before = TxLog.manifest(spark, t).files.toSet
    val changes = Seq((1000L, "a", 1, "U", 1L), (1001L, "b", 1, "U", 1L))
      .toDF("k", "v", "n", "op", "seq")
    TxLog.merge(spark, t, changes, keys = Seq("k"),
      ordering = Seq(col("seq").desc), opCol = "op")
    assert(before.subsetOf(TxLog.manifest(spark, t).files.toSet))
    assert(TxLog.read(spark, t).count() == 52L)
  }
}
