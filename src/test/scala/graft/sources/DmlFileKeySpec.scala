package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 optimization guard: the DML find scan / DV read path keys
  * rows by the last two components of `_metadata.file_path`, computed
  * with `substring_index(path, "/", -2)` (linear scan) instead of the
  * previous end-anchored backtracking regex. This spec pins that the
  * cheap spelling equals the regex spelling on every path shape the
  * scan can report — plain data paths, URI-encoded partition values,
  * multi-level partition dirs — and that a DV round-trip (delete →
  * read) still removes exactly the deleted rows.
  */
class DmlFileKeySpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString + "/t"

  test("substring_index(-2) equals the last-two-components regex") {
    import spark.implicits._
    val paths = Seq(
      "file:/tmp/t/data/0b9a-uuid/part-00000-abc.c000.zstd.parquet",
      "file:/t/data/u/__gp_cat=a%20b/part-00001-def.snappy.parquet",
      "file:/x/__gp_y=1994/__gp_m=2/part-3.parquet",
      "file:/a/part.parquet",
      "hdfs://nn:8020/w/t/data/u2/part-7.parquet")
    val df = paths.toDF("p").select(
      substring_index(col("p"), "/", -2).as("fast"),
      regexp_extract(col("p"), "([^/]+/[^/]+)$", 1).as("re"))
    val rows = df.collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1),
      s"fast='${r.getString(0)}' regex='${r.getString(1)}'"))
  }

  test("DV delete + read keyed by the fast spelling stays row-exact") {
    import spark.implicits._
    val t = tmpDir("dml-key")
    TxLog.overwrite(
      spark.range(1000).select(col("id"), (col("id") % 10).as("k")), t)
    TxLog.delete(spark, t, col("k") === 3, deletionVectors = true)
    val left = TxLog.read(spark, t).select("id").as[Long].collect().sorted
    val expect = (0L until 1000L).filter(_ % 10 != 3).toArray
    assert(left.sameElements(expect))
  }
}
