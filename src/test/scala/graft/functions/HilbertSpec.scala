package graft.functions

import org.apache.spark.sql.functions.{col, pmod, xxhash64, lit}
import org.apache.spark.sql.graftshim.Shim

import graft.SparkSpec

/** Hilbert curve: the defining property — the index is a BIJECTION over
  * the grid whose consecutive positions are ADJACENT cells (unit step in
  * exactly one dimension) — checked exhaustively in 2/3/4 dims, plus
  * codegen parity and the end-to-end transactional pruning path.
  */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  test("bijective and unit-step adjacent, exhaustively (2-d, 3-d, 4-d)") {
    for ((n, bits) <- Seq((2, 4), (3, 3), (4, 2))) {
      val side = 1 << bits
      val total = 1L << (n * bits)
      val byIndex = new Array[Array[Long]](total.toInt)
      var i = 0L
      while (i < total) {
        // i in base `side` enumerates every cell once
        val coords = Array.tabulate(n)(d => (i >> (d * bits)) & (side - 1))
        val h = Hilbert.index(coords, bits)
        assert(h >= 0 && h < total, s"index $h out of range (n=$n)")
        assert(byIndex(h.toInt) == null,
          s"collision at $h: ${byIndex(h.toInt)} vs ${coords.toSeq} (n=$n)")
        byIndex(h.toInt) = coords
        i += 1
      }
      var h = 1
      while (h < total) {
        val a = byIndex(h - 1); val b = byIndex(h)
        val diffs = a.zip(b).map { case (x, y) => math.abs(x - y) }
        assert(diffs.sum == 1 && diffs.max == 1,
          s"n=$n: curve jumps between h=${h - 1} ${a.toSeq} and h=$h ${b.toSeq}")
        h += 1
      }
    }
  }

  test("the codegen'd expression matches the reference per row") {
    val bits = 10
    val df = spark.range(2000).select(
      pmod(xxhash64(col("id"), lit(1)), lit(1L << bits)).as("a"),
      pmod(xxhash64(col("id"), lit(2)), lit(1L << bits)).as("b"),
      pmod(xxhash64(col("id"), lit(3)), lit(1L << bits)).as("c"))
    val got = df.select(col("a"), col("b"), col("c"),
        Shim.column(HilbertIndex(bits, Seq(
          Shim.expression(col("a")), Shim.expression(col("b")),
          Shim.expression(col("c"))))).as("h"))
      .as[(Long, Long, Long, Long)].collect()
    got.foreach { case (a, b, c, h) =>
      assert(h == Hilbert.index(Array(a, b, c), bits), s"($a,$b,$c)")
    }
    // NULL cells pin to 0, the Layout convention
    val withNull = spark.sql("SELECT CAST(NULL AS LONG) AS a, 5L AS b")
    val hn = withNull.select(Shim.column(HilbertIndex(10, Seq(
        Shim.expression(col("a")), Shim.expression(col("b"))))).as("h"))
      .as[Long].head()
    assert(hn == Hilbert.index(Array(0L, 5L), 10))
  }

  test("OPTIMIZE with curve=hilbert prunes a 2-d box like morton") {
    import graft.sources.TxLog
    val t = java.nio.file.Files.createTempDirectory("graft-hilbert")
      .resolve("t").toString
    val df = (0 until 4000).map { i =>
      (i.toLong, (i * 2654435761L % 1000L).toInt, (i * 40503L % 1000L).toInt)
    }.toDF("id", "x", "y").repartition(8, col("id"))
    TxLog.overwrite(df, t)
    def boxFiles(): Int = TxLog.readWhere(spark, t, Seq(
      ("x", Some(100), Some(199)), ("y", Some(100), Some(199))))
      .inputFiles.length
    val before = TxLog.read(spark, t).as[(Long, Int, Int)].collect().toSet
    assert(boxFiles() == 8)
    TxLog.zorderOptimize(spark, t, Seq("x", "y"), numFiles = 8,
      partition = Map.empty, curve = "hilbert")
    assert(boxFiles() <= 3, s"hilbert layout kept ${boxFiles()} of 8 files")
    assert(TxLog.read(spark, t).as[(Long, Int, Int)].collect().toSet == before)
  }
}
