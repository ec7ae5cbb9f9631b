package graft.sources

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

import graft.{SparkSpec, Tables}

class BucketedSpec extends SparkSpec {

  test("bucketed fact-fact join plans with zero shuffle exchanges") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_extendedprice")
      .withColumnRenamed("l_orderkey", "orderkey")
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "orderkey")
    Bucketed.write(li, "li_bkt", "orderkey", 8)
    Bucketed.write(o, "ord_bkt", "orderkey", 8)

    // Force a non-broadcast join so the exchange elision is what's tested.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketed.join(spark, "li_bkt", "ord_bkt", "orderkey")
      assert(joined.count() == Tables.lineitem(spark, sfDir).count())
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeLike => e
      }
      assert(shuffles.isEmpty, s"expected no shuffles, found ${shuffles.size}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }
}
