package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** TxLog.detail (DESCRIBE DETAIL) + readAsOfTimestamp (TIMESTAMP AS OF). */
class TableDetailSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-detail").resolve("t").toString

  test("detail answers operational metadata from the manifest alone") {
    val t = tmpTable()
    TxLog.overwrite((0L until 100L).map(i => (i, s"v$i", i % 5))
      .toDF("k", "v", "g").repartition(4, col("k")), t)
    TxLog.delete(spark, t, col("g") === 2, deletionVectors = true)
    TxLog.setBloomIndex(spark, t, Seq("k"))
    TxLog.addConstraint(spark, t, "k_nonneg", "k >= 0")
    val d = TxLog.detail(spark, t).head
    assert(d.getAs[Long]("version") == TxLog.latestVersion(spark, t).get)
    assert(d.getAs[Long]("num_files") == 4L)
    assert(d.getAs[Long]("num_rows") == 80L) // live, net of the DV
    assert(d.getAs[Long]("num_deletion_vectors") >= 1L)
    assert(d.getAs[String]("bloom_index") == "k")
    assert(d.getAs[Long]("num_constraints") == 1L)
    assert(d.getAs[Long]("size_bytes") > 0L)
    // the metadata answer requires no data file: wipe and re-ask
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(t, "data"), true)
    assert(TxLog.detail(spark, t).head.getAs[Long]("num_rows") == 80L)
  }

  test("TIMESTAMP AS OF picks the last version at or before the instant") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t)
    val ts1 = TxLog.manifest(spark, t).tsMillis
    Thread.sleep(5)
    TxLog.overwrite(Seq((2L, "b")).toDF("k", "v"), t)
    val ts2 = TxLog.manifest(spark, t).tsMillis
    assert(TxLog.readAsOfTimestamp(spark, t, ts1)
      .as[(Long, String)].collect().toSeq == Seq((1L, "a")))
    assert(TxLog.readAsOfTimestamp(spark, t, ts2 + 1000L)
      .as[(Long, String)].collect().toSeq == Seq((2L, "b")))
    val e = intercept[IllegalArgumentException] {
      TxLog.readAsOfTimestamp(spark, t, ts1 - 1000L)
    }
    assert(e.getMessage.contains("no version committed at or before"))
  }

  test("in-commit timestamps stay monotonic under writer clock skew") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t)
    val v1 = TxLog.manifest(spark, t).version
    // fabricate a clock-skewed predecessor: stamp v1 an hour in the
    // future by editing its log record in place (what a fast-clocked
    // writer on another host would have committed)
    val future = System.currentTimeMillis() + 3600L * 1000
    val p = java.nio.file.Paths.get(t, "_txlog", "%020d.json".format(v1))
    val raw = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    java.nio.file.Files.write(p, raw.replaceFirst(
      "\"tsMillis\":\\d+", "\"tsMillis\":" + future).getBytes("UTF-8"))
    TxLog.clearSnapshotCache() // the memo holds the pre-edit stamp
    assert(TxLog.manifest(spark, t).tsMillis == future)
    // the next commit must stamp STRICTLY AFTER its parent, however
    // slow this host's clock — TIMESTAMP AS OF resolves in commit order
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t)
    val m2 = TxLog.manifest(spark, t)
    assert(m2.tsMillis == future + 1,
      "child clamps to parent+1 when the local clock lags the parent")
    assert(TxLog.readAsOfTimestamp(spark, t, future)
      .as[(Long, String)].collect().toSeq == Seq((1L, "a")))
    assert(TxLog.readAsOfTimestamp(spark, t, future + 1)
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
  }
}
