package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every build-side key passes might_contain") {
    val keys = (0 until 2000).map(i => s"key-$i").toDF("s")
    val filter = BloomFns.buildFilter(keys, col("s"), 2000L, 0.01)
    assert(filter.isDefined)
    val passed = keys.filter(BloomFns.mightContain(filter, col("s"))).count()
    assert(passed == 2000L)
  }

  test("false-positive rate on disjoint probes is near the configured fpp") {
    val keys = (0 until 5000).map(i => s"in-$i").toDF("s")
    val filter = BloomFns.buildFilter(keys, col("s"), 5000L, 0.01)
    val probes = (0 until 20000).map(i => s"out-$i").toDF("s")
    val fp = probes.filter(BloomFns.mightContain(filter, col("s"))).count()
    // 1% nominal; generous ceiling so the assert is about the mechanism
    // (pruning works), not the exact hash geometry
    assert(fp < 20000 * 0.05, s"false positives: $fp / 20000")
  }

  test("empty build side yields None and a nothing-matches predicate") {
    val keys = Seq.empty[String].toDF("s")
    val filter = BloomFns.buildFilter(keys, col("s"), 100L, 0.01)
    assert(filter.isEmpty)
    val probes = Seq("a", "b").toDF("s")
    assert(probes.filter(BloomFns.mightContain(filter, col("s"))).count() == 0L)
  }

  test("bloom pre-filter + exact confirm equals the exact join (d16 shape)") {
    val corpus = (0 until 3000).map(i => (i.toLong, s"gram-${i % 500}")).toDF("id", "s")
    val bench = (0 until 100).map(i => s"gram-${i * 3}").toDF("s").distinct()
    val filter = BloomFns.buildFilter(bench, col("s"), 100L, 0.01)
    val viaBloom = corpus.filter(BloomFns.mightContain(filter, col("s")))
      .join(broadcast(bench), "s")
      .groupBy("id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toSet
    val exact = corpus.join(bench, "s")
      .groupBy("id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toSet
    assert(viaBloom == exact)
    assert(exact.nonEmpty)
  }

  test("SQL surface: graft_bloom_agg filter arrives via scalar subquery") {
    (0 until 1000).map(i => s"k-$i").toDF("s").createOrReplaceTempView("bloom_keys")
    (0 until 1000).map(i => if (i % 2 == 0) s"k-$i" else s"x-$i").toDF("s")
      .createOrReplaceTempView("bloom_probe")
    // exact confirm join after the bloom probe — result must be exactly
    // the even keys regardless of false positives
    val got = spark.sql(
      """SELECT p.s FROM bloom_probe p
        |JOIN bloom_keys k ON p.s = k.s
        |WHERE graft_might_contain(
        |  (SELECT graft_bloom_agg(s, 1000, 0.01) FROM bloom_keys), p.s)
        |""".stripMargin).as[String].collect().toSet
    assert(got == (0 until 1000 by 2).map(i => s"k-$i").toSet)
  }

  test("cross-surface: a SQL-built filter probes correctly via the Column API") {
    (0 until 500).map(i => s"xk-$i").toDF("s").createOrReplaceTempView("bloom_xs")
    val bytes = spark.sql("SELECT graft_bloom_agg(s, 500, 0.01) FROM bloom_xs")
      .head.getAs[Array[Byte]](0)
    // no false negatives across surfaces ⇒ seed/sizing are shared
    val pass = (0 until 500).map(i => s"xk-$i").toDF("s")
      .filter(BloomFns.mightContain(Some(bytes), col("s"))).count()
    assert(pass == 500L)
  }

  test("SQL surface: literal-argument validation fails loudly") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_bloom_agg(s, 0, 0.01) FROM VALUES ('a') t(s)").collect()
    }
    assert(e.getMessage.contains("expectedItems"))
  }

  test("rejects nonsensical sizing parameters") {
    intercept[IllegalArgumentException] { BloomFns.bloomAgg(col("s"), 0L, 0.01) }
    intercept[IllegalArgumentException] { BloomFns.bloomAgg(col("s"), 10L, 0.0) }
    intercept[IllegalArgumentException] { BloomFns.bloomAgg(col("s"), 10L, 1.0) }
  }
}
