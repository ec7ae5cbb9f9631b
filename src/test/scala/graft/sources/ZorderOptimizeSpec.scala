package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** TxLog.zorderOptimize — transactional OPTIMIZE ZORDER (q114). */
class ZorderOptimizeSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-zorder").resolve("t").toString

  /** 4000 rows over a 2-d grid, hash-scattered into 8 files: every
    * file's [min,max] box on (x, y) spans the whole plane, so a 2-d
    * range query can prune nothing before the optimize.
    */
  private def publishScattered(t: String): Unit = {
    val df = (0 until 4000).map { i =>
      (i.toLong, (i * 2654435761L % 1000L).toInt, (i * 40503L % 1000L).toInt)
    }.toDF("id", "x", "y").repartition(8, col("id"))
    TxLog.overwrite(df, t)
  }

  private def boxFiles(t: String): Int =
    TxLog.readWhere(spark, t, Seq(
      ("x", Some(100), Some(199)), ("y", Some(100), Some(199))))
      .inputFiles.length

  test("zorder rewrite makes a 2-d box query prune; rows are untouched") {
    val t = tmpTable()
    publishScattered(t)
    val before = TxLog.read(spark, t).as[(Long, Int, Int)].collect().toSet
    assert(boxFiles(t) == 8, "scattered layout must not prune")
    val v = TxLog.zorderOptimize(spark, t, "x", "y", numFiles = 8)
    assert(TxLog.manifest(spark, t).action == "zorder")
    // tight Morton boxes: the 1/100 box intersects few files
    assert(boxFiles(t) <= 3, s"z-ordered layout kept ${boxFiles(t)} of 8 files")
    // row-preserving
    assert(TxLog.read(spark, t).as[(Long, Int, Int)].collect().toSet == before)
    // history: the pre-optimize snapshot still reads the old files
    assert(TxLog.readAsOf(spark, t, v - 1).as[(Long, Int, Int)]
      .collect().toSet == before)
  }

  test("N-dimensional zorder: a 3-d box query prunes on every dimension") {
    val t = tmpTable()
    // hash-scattered over a 3-d grid: before the optimize every file's
    // box spans the whole cube on all three axes
    val df = (0 until 6000).map { i =>
      (i.toLong, (i * 2654435761L % 1000L).toInt,
        (i * 40503L % 1000L).toInt, (i * 2246822519L % 1000L).toInt)
    }.toDF("id", "x", "y", "zc").repartition(8, col("id"))
    TxLog.overwrite(df, t)
    def cube(): Int = TxLog.readWhere(spark, t, Seq(
      ("x", Some(0), Some(249)), ("y", Some(0), Some(249)),
      ("zc", Some(0), Some(249)))).inputFiles.length
    def oneAxis(c: String): Int = TxLog.readWhere(spark, t,
      Seq((c, Some(0), Some(124)))).inputFiles.length
    val before = TxLog.read(spark, t).as[(Long, Int, Int, Int)].collect().toSet
    assert(cube() == 8, "scattered layout must not prune")
    TxLog.zorderOptimize(spark, t, Seq("x", "y", "zc"), numFiles = 8,
      partition = Map.empty, curve = "morton")
    // a 1/64 cube intersects few of the 8 Morton boxes, and EACH single
    // axis prunes too (no dimension is sacrificed). With only 8 files
    // (~octant granularity) an exact single-axis count depends on where
    // the range-partition quantiles fall relative to the octant planes,
    // so the per-axis claim is "strictly prunes", not a tight count.
    assert(cube() <= 3, s"3-d box kept ${cube()} of 8 files")
    Seq("x", "y", "zc").foreach(c =>
      assert(oneAxis(c) < 8, s"axis $c pruned nothing (kept all 8 files)"))
    // row-preserving
    assert(TxLog.read(spark, t).as[(Long, Int, Int, Int)].collect().toSet
      == before)
  }

  test("partition-targeted zorder leaves other partitions' files alone") {
    val t = tmpTable()
    val df = (0 until 2000).map { i =>
      (i.toLong, (i * 2654435761L % 1000L).toInt, (i * 40503L % 1000L).toInt,
        2024 + i % 2)
    }.toDF("id", "x", "y", "yr")
    TxLog.overwrite(df.repartition(6, col("id")), t,
      partitionBy = Some(Seq("yr")))
    val m0 = TxLog.manifest(spark, t)
    val other = m0.files.filter(_.contains("__gp_yr=2025")).toSet
    val target = m0.files.filter(_.contains("__gp_yr=2024")).toSet
    TxLog.zorderOptimize(spark, t, "x", "y", numFiles = 4,
      partition = Map("yr" -> 2024))
    val after = TxLog.manifest(spark, t)
    // 2025's files survive verbatim; 2024's were all rewritten
    assert(other.subsetOf(after.files.toSet))
    assert(after.files.toSet.intersect(target).isEmpty)
    // layout column metadata stays complete (partition ops still work)
    assert(TxLog.partitions(spark, t).count() == 2L)
    assert(TxLog.read(spark, t).count() == 2000L)
  }

  test("zorder materializes deletion vectors in the rewrite") {
    val t = tmpTable()
    publishScattered(t)
    TxLog.delete(spark, t, org.apache.spark.sql.functions.col("x") < 100,
      deletionVectors = true)
    val liveBefore = TxLog.read(spark, t).as[(Long, Int, Int)].collect().toSet
    TxLog.zorderOptimize(spark, t, "x", "y", numFiles = 8)
    val m = TxLog.manifest(spark, t)
    assert(m.dvs.forall(_.isEmpty), "rewritten files must not carry vectors")
    assert(TxLog.read(spark, t).as[(Long, Int, Int)].collect().toSet ==
      liveBefore)
    // with the vectors gone the metadata aggregate works again, and the
    // row count matches the live set
    assert(TxLog.statsAggregate(spark, t).head.getLong(0) ==
      liveBefore.size.toLong)
  }

  test("non-numeric or missing zorder columns fail loudly") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a", 2)).toDF("id", "s", "x"), t)
    intercept[IllegalArgumentException] {
      TxLog.zorderOptimize(spark, t, "s", "x", 2)
    }
    intercept[IllegalArgumentException] {
      TxLog.zorderOptimize(spark, t, "nope", "x", 2)
    }
  }
}
