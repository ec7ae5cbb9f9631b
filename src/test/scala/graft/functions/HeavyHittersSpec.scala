package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("every true heavy hitter survives and estimates honor the MG error bound") {
    // Zipf-ish stream: a few dominant terms + a long tail
    val rnd = new Random(3L)
    val terms = Seq.fill(20000) {
      val r = rnd.nextInt(100)
      if (r < 30) "alpha" else if (r < 50) "beta" else if (r < 60) "gamma"
      else s"tail${rnd.nextInt(5000)}"
    }
    val df = terms.toDF("term").repartition(8)
    val capacity = 32
    val out = df
      .agg(HeavyHitters.heavyHitters(col("term"), capacity, emit = 10).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.term"), col("h.est")).as[(String, Long)].collect().toMap

    val exact = terms.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val n = terms.size.toLong
    val bound = n / (capacity + 1)
    // guarantee 1: every term with true count > n/(capacity+1) is present
    exact.filter(_._2 > bound).keys.foreach { t =>
      assert(out.contains(t), s"true heavy hitter $t missing (bound $bound)")
    }
    // guarantee 2: estimates never exceed the true count and undercount
    // by at most the bound
    out.foreach { case (t, est) =>
      val tc = exact(t)
      assert(est <= tc, s"$t overestimated: $est > $tc")
      assert(tc - est <= bound, s"$t undercounted past the bound: $tc - $est > $bound")
    }
    assert(out("alpha") > out("beta") && out("beta") > out("gamma"))
  }

  test("merge is order-independent: same estimates under different partition counts of the same layout") {
    // the per-partition summaries are fixed by the (deterministic)
    // repartition layout; merging them in any order must yield one result
    val df = Seq.tabulate(5000)(i => s"t${i % 37}").toDF("term").repartition(6)
    def run(): Map[String, Long] = df
      .agg(HeavyHitters.heavyHitters(col("term"), 16, 16).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.term"), col("h.est")).as[(String, Long)].collect().toMap
    assert(run() == run())
  }

  test("graft_heavy_hitters is callable from SQL") {
    graft.GraftExtensions.register(spark)
    Seq("a", "a", "a", "b", "b", "c").toDF("t").createOrReplaceTempView("hh_v")
    val out = spark.sql(
      "SELECT explode(graft_heavy_hitters(t, 4, 2)) AS h FROM hh_v")
      .selectExpr("h.term", "h.est").as[(String, Long)].collect().toSeq
    assert(out == Seq(("a", 3L), ("b", 2L)))
  }

  test("heavy hitters over the documents corpus finds the stopword spine") {
    val out = graft.queries.LlmData.defs("t09_heavy_hitters")(spark, sfDir)
      .as[(String, Long)].collect()
    assert(out.length == 20)
    val terms = out.map(_._1).toSet
    // the corpus is English-dominated; its most frequent tokens must
    // include common stopwords
    assert(terms.exists(Set("the", "and", "of", "a").contains), out.mkString(", "))
  }
}
