package graft.operators

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(71L)
  private val rows = Seq.tabulate(4000)(i =>
    (i.toLong, s"dom${rnd.nextInt(5)}", 1L + rnd.nextInt(200)))
  private def df = rows.toDF("id", "dom", "w")
  private def h = md5(col("id").cast("string").cast("binary"))

  test("hashPrefixSum equals the naive single-window running sum") {
    val naive = df.withColumn("cum_ref",
      sum(col("w")).over(Window.partitionBy("dom").orderBy(h, col("id"))
        .rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("id"), col("cum_ref"))
    Seq(1, 2, 3).foreach { len =>
      val got = Mixture.hashPrefixSum(df, "dom", h, col("id"), col("w"),
        slicePrefixLen = len)
      val diff = got.join(naive, "id")
        .filter(col("__cum") =!= col("cum_ref")).count()
      assert(diff == 0, s"prefix-sum mismatch at slicePrefixLen=$len")
    }
  }

  test("budgetFill keeps exactly the greedy prefix, boundary inclusive") {
    // deterministic tiny domain: weights chosen so the 50% boundary
    // lands EXACTLY on a row's inclusive cum (20 of 40) — it must be kept
    val tiny = Seq((1L, "d", 12L), (2L, "d", 8L), (3L, "d", 15L), (4L, "d", 5L))
      .toDF("id", "dom", "w")
    // hash order of ids 1..4: compute it, then the expected greedy set
    val order = tiny.withColumn("h", md5(col("id").cast("string").cast("binary")))
      .orderBy("h").select("id", "w").as[(Long, Long)].collect()
    val cums = order.scanLeft(0L)(_ + _._2).drop(1)
    val expected = order.zip(cums).takeWhile(_._2 * 100 <= 50 * 40).map(_._1._1).toSet
    val kept = Mixture.budgetFill(tiny, "dom", md5(col("id").cast("string")
        .cast("binary")), col("id"), col("w"), lit(50))
      .select("id").as[Long].collect().toSet
    assert(kept == expected, s"kept $kept, expected $expected")
    assert(kept.nonEmpty && kept.size < 4)
  }

  test("budgetFill respects per-domain percent columns") {
    val pct = when(col("dom") === "dom0", 100).otherwise(0)
    val kept = Mixture.budgetFill(df, "dom", h, col("id"), col("w"), pct)
    // 0% keeps nothing (cum*100 <= 0 is false for positive weights);
    // 100% keeps the whole domain
    val byDom = kept.groupBy("dom").count().as[(String, Long)].collect().toMap
    val total = rows.count(_._2 == "dom0").toLong
    assert(byDom == Map("dom0" -> total))
  }

  test("reserved column names are rejected") {
    val bad = Seq((1L, "d", 2L)).toDF("id", "dom", "__cum")
    val e = intercept[IllegalArgumentException] {
      Mixture.hashPrefixSum(bad, "dom", h, col("id"), col("id"))
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("global shuffle (d25 shape): pos is a permutation, stable under partitioning") {
    // constant domain + weight 1 turns the prefix scan into a global
    // row_number in seeded-hash order — the training-order shuffle
    def shuffled(parts: Int) = Mixture.hashPrefixSum(
        df.select(col("id")).repartition(parts).withColumn("part", lit(0)),
        "part", h, col("id"), lit(1L))
      .select(col("id"), (col("__cum") - 1).as("pos"))
    val a = shuffled(3).as[(Long, Long)].collect().sortBy(_._1)
    // a permutation of 0..n-1 …
    assert(a.map(_._2).sorted.toSeq == (0L until rows.size.toLong))
    // … that matches the naive global order …
    val ref = df.select(col("id")).withColumn("h", h)
      .orderBy(col("h"), col("id")).select("id").as[Long].collect()
      .zipWithIndex.map { case (id, i) => (id, i.toLong) }.sortBy(_._1)
    assert(a.toSeq == ref.toSeq)
    // … and is byte-identical under a different input partitioning
    assert(shuffled(17).as[(Long, Long)].collect().sortBy(_._1).toSeq == a.toSeq)
  }
}
