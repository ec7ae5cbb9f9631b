package graft

import org.apache.spark.sql.functions.col

/** Pins the scale-adaptive scan fan-out (Tables.fanned): a
  * single-row-group parquet table is repartitioned to session
  * parallelism by the declared key, while a layout that already yields
  * at least session-parallelism scan splits is returned UNCHANGED — the
  * condition that keeps the helper a no-op (no added shuffle) at
  * many-file production scale.
  */
class ScanFanoutSpec extends SparkSpec {

  test("single-split table fans out to session parallelism by key") {
    val raw = Tables.load(spark, sfDir, "documents")
    val f = Tables.fanned(spark, sfDir, "documents", raw, Seq("doc_id"))
    // testdata ships one single-row-group file: the loader must insert a
    // hash repartition on doc_id at the session's parallelism
    assert(!(f eq raw), "fan-out must fire on a single-split layout")
    assert(f.rdd.getNumPartitions ==
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
    // fan-out must not change the rows (hash repartition only moves them)
    assert(f.count() == raw.count())
  }

  test("a layout with >= parallelism splits is returned unchanged") {
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val tmp = java.nio.file.Files.createTempDirectory("fanout-many").toString
    // 2n single-row-group files => 2n scan splits >= n: condition false,
    // and fanned must return the INPUT FRAME ITSELF (no added shuffle)
    Tables.load(spark, sfDir, "documents")
      .repartition(2 * n).write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val raw = spark.read.parquet(s"$tmp/documents.parquet")
    val many = Tables.fanned(spark, tmp, "documents", raw, Seq("doc_id"))
    assert(many eq raw,
      "fan-out must be a no-op when the scan already parallelizes")
  }

  test("fanned frame preserves per-key completeness for window reuse") {
    // every doc_id's rows land in ONE partition (hash clustering) — the
    // property that lets per-key windows/aggregates reuse the exchange
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"))
    val perPart = d
      .withColumn("p", org.apache.spark.sql.functions.spark_partition_id())
      .groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.countDistinct("p").as("nparts"))
    assert(perPart.filter(col("nparts") > 1).count() == 0)
  }
}
