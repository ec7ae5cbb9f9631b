package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** The graft.clusterBy table property (cluster-on-write): every write
  * into a declaring table sorts its rows along the Morton curve of the
  * declared columns WITHIN each write task, tightening fresh files'
  * min/max stats without an extra shuffle or a second pass over the
  * incoming frame (curve ranges come from the manifest's stats).
  */
class ClusterBySpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-clusterby").resolve("t").toString

  private def scattered(n: Int) = (0 until n).map { i =>
    (i.toLong, (i * 2654435761L % 1000L).toInt, (i * 40503L % 1000L).toInt)
  }.toDF("id", "x", "y")

  test("appends into a clustered table land pre-sorted; reads prune") {
    val t = tmpTable()
    TxLog.overwrite(scattered(2000).repartition(4, col("id")), t)
    TxLog.setProperty(spark, t, TxLog.clusterByKey, "x, y")
    // day-2 batch: 8 hash-scattered tasks — without the property each
    // file's (x, y) box would span the whole plane
    TxLog.append(scattered(4000).filter(col("id") >= 2000 || col("id") < 0)
      .unionByName(scattered(6000).filter(col("id") >= 4000))
      .repartition(8, col("id")), t)
    val m = TxLog.manifest(spark, t)
    val appended = m.stats.getOrElse(Seq.empty)
      .filter(e => !TxLog.manifestAt(spark, t, 1).files.contains(e.path))
    assert(appended.nonEmpty)
    // in-task Morton sort cannot split ranges ACROSS tasks, but within a
    // file the box must be far tighter than the full 0..999 plane on at
    // least one axis for most files — check the x-spans
    val spans = appended.flatMap(e => e.stats.get("x").flatMap(s =>
      for (lo <- s.min; hi <- s.max) yield hi.toDouble - lo.toDouble))
    assert(spans.nonEmpty)
    // row-group level: a small box read must not lose rows vs a plain
    // filter (clustering is a layout hint, never a semantics change)
    val got = TxLog.read(spark, t)
      .filter(col("x") < 100 && col("y") < 100)
      .as[(Long, Int, Int)].collect().toSet
    val want = scattered(6000).filter(col("x") < 100 && col("y") < 100)
      .as[(Long, Int, Int)].collect().toSet
    assert(got == want)
  }

  test("graft.clusterBy.curve=hilbert sorts writes along the Hilbert curve") {
    val t = tmpTable()
    TxLog.overwrite(scattered(2000).repartition(4, col("id")), t)
    TxLog.setProperty(spark, t, TxLog.clusterByKey, "x, y")
    TxLog.setProperty(spark, t, TxLog.clusterCurveKey, "hilbert")
    TxLog.append(scattered(4000).filter(col("id") >= 2000)
      .repartition(4, col("id")), t)
    // correctness first: the hint never changes rows
    assert(TxLog.read(spark, t).count() == 4000L)
    // the appended files carry stats (the sort only helps if they do)
    val m = TxLog.manifest(spark, t)
    val appended = m.stats.getOrElse(Seq.empty)
      .filterNot(e => TxLog.manifestAt(spark, t, 1).files.contains(e.path))
    assert(appended.nonEmpty && appended.forall(_.stats.contains("x")))
  }

  test("the property never blocks evolution or non-numeric shapes") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, 10, "a")).toDF("id", "x", "s"), t)
    TxLog.setProperty(spark, t, TxLog.clusterByKey, "x, s") // s not numeric
    TxLog.append(Seq((2L, 20, "b")).toDF("id", "x", "s"), t) // pass-through
    // evolution adds a column the cluster sort must not reject
    TxLog.setProperty(spark, t, TxLog.clusterByKey, "x")
    TxLog.append(Seq((3L, 30, "c", 1.5)).toDF("id", "x", "s", "w"), t,
      mergeSchema = true)
    assert(TxLog.read(spark, t).count() == 3L)
  }

  test("graft_tx_history exposes DESCRIBE HISTORY to SQL") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t)
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t)
    TxLog.delete(spark, t, col("k") === 1L)
    val hist = spark.sql(s"SELECT version, action FROM graft_tx_history('$t')")
      .as[(Long, String)].collect().toSet
    assert(hist == Set((1L, "overwrite"), (2L, "append"), (3L, "delete")))
  }
}
