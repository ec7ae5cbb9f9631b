package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** TxLog.generateSymlinkManifest — the Delta
  * `GENERATE symlink_format_manifest` interop surface: text manifests
  * an external parquet engine reads to see exactly the live snapshot.
  */
class SymlinkManifestSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-symlink").resolve("t").toString

  private def lines(t: String, rel: String): Seq[String] =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(t, rel)), "UTF-8").split("\n").toSeq
      .filter(_.nonEmpty)

  test("unpartitioned: one manifest listing exactly the live files") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .repartitionByRange(2, col("k")), t)
    TxLog.append(Seq((3L, "c")).toDF("k", "v"), t)
    val written = TxLog.generateSymlinkManifest(spark, t)
    assert(written == Seq("_symlink_format_manifest/manifest"))
    val m = TxLog.manifest(spark, t)
    val got = lines(t, written.head)
    assert(got.size == m.files.size)
    m.files.foreach(rel => assert(got.exists(_.endsWith(rel)), rel))
    // an external engine reading the listed parquet sees the snapshot
    assert(spark.read.parquet(got: _*).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("partitioned: one manifest per live partition, stale dirs replaced") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a", 2020), (2L, "b", 2021)).toDF("k", "v", "y"),
      t, partitionBy = Some(Seq("y")))
    val w1 = TxLog.generateSymlinkManifest(spark, t)
    assert(w1.toSet == Set("_symlink_format_manifest/y=2020/manifest",
      "_symlink_format_manifest/y=2021/manifest"))
    // drop 2021 whole, regenerate: its manifest must NOT survive
    TxLog.dropPartitions(spark, t, Map("y" -> 2021))
    val w2 = TxLog.generateSymlinkManifest(spark, t)
    assert(w2 == Seq("_symlink_format_manifest/y=2020/manifest"))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(t, "_symlink_format_manifest/y=2021/manifest")),
      "a vanished partition's stale manifest must be replaced away")
    assert(spark.read.parquet(lines(t, w2.head): _*).count() == 1L)
  }

  test("hive-special characters in partition values escape in the dir") {
    val t = tmpTable()
    // '/', '=', '%' in a raw value would nest a bogus directory or
    // corrupt the k=v parse for an external Hive-layout reader
    TxLog.overwrite(Seq((1L, "a/b"), (2L, "x=y"), (3L, "p%q"))
      .toDF("k", "p"), t, partitionBy = Some(Seq("p")))
    val w = TxLog.generateSymlinkManifest(spark, t)
    assert(w.toSet == Set(
      "_symlink_format_manifest/p=a%2Fb/manifest",
      "_symlink_format_manifest/p=x%3Dy/manifest",
      "_symlink_format_manifest/p=p%25q/manifest"))
    // exactly one directory level per partition — nothing nested
    w.foreach(rel => assert(rel.split('/').length == 3, rel))
    val all = w.flatMap(rel => lines(t, rel))
    assert(spark.read.parquet(all: _*).count() == 3L)
  }

  test("deletion vectors refuse generation; purge unblocks it") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1), t)
    TxLog.delete(spark, t, col("k") === 1L, deletionVectors = true)
    assert(TxLog.manifest(spark, t).dvs.exists(_.nonEmpty),
      "the delete must leave a real vector for this case to mean anything")
    val e = intercept[IllegalArgumentException] {
      TxLog.generateSymlinkManifest(spark, t)
    }
    assert(e.getMessage.contains("deletion vectors"))
    TxLog.purgeDvs(spark, t)
    val w = TxLog.generateSymlinkManifest(spark, t)
    assert(spark.read.parquet(lines(t, w.head): _*)
      .as[(Long, String)].collect().toSeq == Seq((2L, "b")),
      "post-purge manifests expose exactly the live rows")
  }

  test("the auto-generate property regenerates on every commit") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1), t)
    TxLog.setProperty(spark, t, TxLog.symlinkAutoKey, "true")
    // the property commit itself generated; an append refreshes it
    val m1 = lines(t, "_symlink_format_manifest/manifest")
    assert(m1.nonEmpty)
    TxLog.append(Seq((3L, "c")).toDF("k", "v"), t)
    val m2 = lines(t, "_symlink_format_manifest/manifest")
    assert(m2.size == m1.size + 1, "the post-commit hook refreshed")
    assert(spark.read.parquet(m2: _*).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // a REAL vector write skips regeneration (must not fail the commit)
    // so the manifest goes stale — documented; purge re-syncs it
    TxLog.delete(spark, t, col("k") === 1L, deletionVectors = true)
    assert(TxLog.manifest(spark, t).dvs.exists(_.nonEmpty))
    assert(lines(t, "_symlink_format_manifest/manifest") == m2,
      "stale by design under DVs — never fail or mislead the DV commit")
    // purge materializes the vector AND, with the property set, re-syncs
    TxLog.purgeDvs(spark, t)
    assert(spark.read.parquet(
      lines(t, "_symlink_format_manifest/manifest"): _*)
      .as[(Long, String)].collect().toSet ==
      Set((2L, "b"), (3L, "c")))
  }

  test("SQL: GENERATE symlink_format_manifest FOR TABLE t") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t)
    spark.sql("DROP TABLE IF EXISTS gen_sql")
    spark.sql(s"CREATE TABLE gen_sql USING `graft-txlog` OPTIONS (path '$t')")
    try {
      val rows = spark.sql(
        "GENERATE symlink_format_manifest FOR TABLE gen_sql").collect()
      assert(rows.map(_.getString(0)).toSeq ==
        Seq("_symlink_format_manifest/manifest"))
      assert(lines(t, rows(0).getString(0)).size == 1)
    } finally spark.sql("DROP TABLE IF EXISTS gen_sql")
  }
}
