package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSpec

/** Arbitrary-predicate replaceWhere (TxLog.replaceWhere scaladoc): one
  * atomic commit = delete-matching + insert, with Delta's constraint
  * that every inserted row satisfies the predicate.
  */
class ReplaceWhereSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-replwhere").resolve("t").toString

  private def seed(t: String): Unit =
    TxLog.overwrite((1L to 10L).map(i => (i, s"v$i", i * 10))
      .toDF("k", "v", "n").repartition(5, col("k")), t)

  test("replaces exactly the predicate's rows in ONE commit") {
    val t = tmpTable(); seed(t)
    val v0 = TxLog.latestVersion(spark, t).get
    TxLog.replaceWhere(
      Seq((4L, "NEW4", 999L), (5L, "NEW5", 999L)).toDF("k", "v", "n"),
      t, col("k").between(4L, 6L))
    assert(TxLog.latestVersion(spark, t).get == v0 + 1, "one atomic commit")
    val got = TxLog.read(spark, t).as[(Long, String, Long)].collect().toSet
    assert(got == ((1L to 3L) ++ (7L to 10L)).map(i => (i, s"v$i", i * 10)).toSet
      ++ Set((4L, "NEW4", 999L), (5L, "NEW5", 999L)),
      "range rows replaced (6 deleted, 4/5 restated), others untouched")
    assert(TxLog.manifest(spark, t).action == "replaceWhere")
  }

  test("untouched files keep their identity; an empty match still inserts") {
    val t = tmpTable(); seed(t)
    val before = TxLog.manifest(spark, t)
    val matchless = findOf(before, t, spark) // files with no k=4..6 row
    TxLog.replaceWhere(Seq((4L, "X", 0L)).toDF("k", "v", "n"),
      t, col("k").between(4L, 6L))
    val after = TxLog.manifest(spark, t).files.toSet
    assert(matchless.forall(after), "files outside the predicate are untouched metadata")
    // predicate matching nothing: pure insert, nothing dropped
    TxLog.replaceWhere(Seq((99L, "new", 1L)).toDF("k", "v", "n"),
      t, col("k") === 99L)
    assert(TxLog.read(spark, t).where(col("k") === 99L).count() == 1L)
  }

  private def findOf(m: TxLog.Manifest, t: String,
      s: org.apache.spark.sql.SparkSession): Seq[String] =
    m.stats.getOrElse(Seq.empty).filter { e =>
      val lo = e.stats.get("k").flatMap(_.min).map(_.toLong)
      val hi = e.stats.get("k").flatMap(_.max).map(_.toLong)
      lo.exists(_ > 6L) || hi.exists(_ < 4L)
    }.map(_.path)

  test("an inserted row outside the predicate fails the write, commits nothing") {
    val t = tmpTable(); seed(t)
    val v0 = TxLog.latestVersion(spark, t).get
    val e = intercept[Exception] {
      TxLog.replaceWhere(Seq((4L, "in", 1L), (8L, "OUT", 1L)).toDF("k", "v", "n"),
        t, col("k").between(4L, 6L))
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Seq.empty else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("does not satisfy the replacement predicate")))
    assert(TxLog.latestVersion(spark, t).get == v0, "nothing committed")
    assert(TxLog.read(spark, t).count() == 10L)
  }

  test("changeFeed records replaced pre-images and inserted post-images only") {
    val t = tmpTable(); seed(t)
    val since = TxLog.latestVersion(spark, t).get
    TxLog.replaceWhere(Seq((5L, "NEW5", 999L)).toDF("k", "v", "n"),
      t, col("k").between(4L, 6L), changeFeed = true)
    val cdf = TxLog.readChangeFeed(spark, t, since)
      .select("k", "_change_type").as[(Long, String)].collect().toSet
    assert(cdf == Set((4L, "delete"), (5L, "delete"), (6L, "delete"),
      (5L, "insert")),
      "kept boundary rows must appear as neither delete nor insert")
  }

  test("deletion-vectored rows are not resurrected by the boundary rewrite") {
    val t = tmpTable(); seed(t)
    TxLog.delete(spark, t, col("k") === 7L, deletionVectors = true)
    // k=7 shares a file with live rows; replacing k=6..8 rewrites it
    TxLog.replaceWhere(Seq((6L, "NEW6", 0L)).toDF("k", "v", "n"),
      t, col("k").between(6L, 8L))
    val ks = TxLog.read(spark, t).select("k").as[Long].collect().toSet
    assert(ks == Set(1L, 2L, 3L, 4L, 5L, 6L, 9L, 10L),
      s"k=7 (DV-deleted) and k=8 (replaced away) must stay gone, got $ks")
  }

  test("CHECK constraints enforce on the inserted rows") {
    val t = tmpTable(); seed(t)
    TxLog.addConstraint(spark, t, "n_nonneg", "n >= 0")
    val e = intercept[Exception] {
      TxLog.replaceWhere(Seq((5L, "bad", -1L)).toDF("k", "v", "n"),
        t, col("k") === 5L)
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Seq.empty else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("n_nonneg")))
  }
}
