package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** The reader-feature protocol gate: manifests declare the features a
  * reader MUST implement to return correct answers (column mapping,
  * deletion vectors), and a build that does not know one refuses the
  * read loudly — json4s drops unknown JSON fields silently, so without
  * the requirement list a future manifest meeting old code mis-reads
  * (physical names surface, deleted rows resurrect) instead of
  * erroring.
  */
class FeatureGateSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-feature").resolve("t").toString

  test("features are derived from state and drop with it") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1), t)
    assert(TxLog.manifest(spark, t).features.isEmpty,
      "plain parquet + log requires nothing")
    TxLog.renameColumn(spark, t, "v", "w")
    assert(TxLog.manifest(spark, t).features.contains(Seq("column-mapping")))
    TxLog.delete(spark, t, col("k") === 1L, deletionVectors = true)
    assert(TxLog.manifest(spark, t).features.contains(
      Seq("column-mapping", "deletion-vectors")))
    // materializing the vector drops its requirement
    TxLog.purgeDvs(spark, t)
    assert(TxLog.manifest(spark, t).features.contains(Seq("column-mapping")))
    // renaming back to the physical name clears the map AND the feature
    TxLog.renameColumn(spark, t, "w", "v")
    assert(TxLog.manifest(spark, t).features.isEmpty)
  }

  test("an unknown required feature fails every read loudly") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t)
    val v = TxLog.manifest(spark, t).version
    // what a FUTURE build's commit looks like to this one: a record
    // demanding a feature this code has never heard of
    val p = java.nio.file.Paths.get(t, "_txlog", "%020d.json".format(v))
    val raw = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    java.nio.file.Files.write(p, raw.replaceFirst("\\{",
      """{"features":["time-crystals"],""").getBytes("UTF-8"))
    TxLog.clearSnapshotCache()
    val e = intercept[IllegalArgumentException] { TxLog.read(spark, t) }
    assert(e.getMessage.contains("time-crystals") &&
      e.getMessage.contains("does not support"), e.getMessage)
    // maintenance refuses too — it would re-commit state it mis-read
    intercept[IllegalArgumentException] { TxLog.compact(spark, t) }
  }

  test("restore to a pre-feature version drops the requirement") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t)
    val plain = TxLog.manifest(spark, t).version
    TxLog.renameColumn(spark, t, "v", "w")
    assert(TxLog.manifest(spark, t).features.nonEmpty)
    TxLog.restore(spark, t, plain)
    assert(TxLog.manifest(spark, t).features.isEmpty,
      "the restored state needs nothing, so the commit declares nothing")
  }
}
