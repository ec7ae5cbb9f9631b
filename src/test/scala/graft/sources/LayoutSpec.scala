package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("interleave16 places a-bits at even and b-bits at odd positions") {
    val rows = Seq((0xFFFFL, 0L), (0L, 0xFFFFL), (3L, 1L), (0L, 0L), (0xFFFFL, 0xFFFFL))
      .toDF("a", "b")
      .select(Layout.interleave16(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    assert(rows == Seq(0x55555555L, 0xAAAAAAAAL, 7L, 0L, 0xFFFFFFFFL))
  }

  test("zValue preserves locality: quadrant points sort before far points") {
    // all points in the low-left quadrant must have smaller z than any
    // point in the high-right quadrant — the property range partitioning
    // relies on to give files bounded boxes
    val xR = (0.0, 1023.0); val yR = (0.0, 1023.0)
    val df = Seq((10.0, 20.0), (100.0, 300.0), (900.0, 800.0), (600.0, 700.0))
      .toDF("x", "y")
      .select(col("x"), Layout.zValue(col("x"), xR, col("y"), yR).as("z"))
    val z = df.orderBy("x").select("z").as[Long].collect()
    assert(z(0) < z(2) && z(0) < z(3) && z(1) < z(2) && z(1) < z(3))
  }

  test("degenerate range maps to cell 0 instead of dividing by zero") {
    val got = Seq((5.0, 7.0)).toDF("x", "y")
      .select(Layout.zValue(col("x"), (3.0, 3.0), col("y"), (0.0, 10.0)).as("z"))
      .as[Long].collect().head
    // x contributes nothing; z is y's bits alone (odd positions)
    assert((got & 0x55555555L) == 0L)
  }

  test("NULL coordinates pin to cell 0, not the top grid corner") {
    val got = Seq((Some(5.0), Some(7.0)), (None, Some(7.0)), (Some(5.0), None))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), (0.0, 10.0), col("y"), (0.0, 10.0)).as("z"))
      .as[Long].collect()
    // null x: even (x) bit positions all zero; null y: odd positions zero
    assert((got(1) & 0x55555555L) == 0L, s"null x leaked x-bits: ${got(1)}")
    assert((got(2) & 0xAAAAAAAAL) == 0L, s"null y leaked y-bits: ${got(2)}")
  }

  test("z-ordered layout skips files for single-dimension filters; linear layout cannot") {
    // 64×64 grid; 16 files. A filter on y alone touches every file of an
    // x-sorted layout but only the files whose z-box intersects the y
    // band. This is the measurable claim behind the operator.
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toDouble, y.toDouble)))
      .toDF("x", "y")
    val zDir = Files.createTempDirectory("graft-zorder").toString
    val linDir = Files.createTempDirectory("graft-linear").toString
    Layout.writeZOrdered(grid, "x", "y", numFiles = 16, zDir)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linDir)

    def filesTouched(dir: String): Long =
      spark.read.parquet(dir).filter(col("y") < 8.0)
        .select(input_file_name()).distinct().count()
    val zFiles = filesTouched(zDir)
    val linFiles = filesTouched(linDir)
    assert(linFiles == 16L, s"x-sorted layout should smear y: $linFiles")
    assert(zFiles <= 8L, s"z-order should bound the y band to few files: $zFiles")
    // and the data survives the round trip
    assert(spark.read.parquet(zDir).count() == 64L * 64L)
  }
}
