package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private val skewed = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i.toLong, i * 0.5))
    .toDF("key", "row_id", "v")

  test("saltedSumCount equals the plain aggregation") {
    val plain = skewed.groupBy("key")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .as[(Long, Double, Long)].collect().toSet
    val salted = Skew.saltedSumCount(skewed, Seq("key"), "v", col("row_id"), 8)
      .as[(Long, Double, Long)].collect().toSet
    assert(salted == plain)
  }

  test("saltedJoin equals the plain inner join") {
    val dim = Seq((1L, "hot"), (950L, "cold")).toDF("key", "label")
    val plain = skewed.join(dim, "key").select("key", "row_id", "label")
      .as[(Long, Long, String)].collect().toSet
    val salted = Skew.saltedJoin(skewed, dim, "key", col("row_id"), 8)
      .select("key", "row_id", "label")
      .as[(Long, Long, String)].collect().toSet
    assert(salted == plain)
    assert(plain.size == 901)
  }
}
