package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Driver-contract smoke: every declared query runs on sf0.001 and
  * returns rows; every oracle key has a matching query.
  */
class EntrySpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracles without queries: $extra")
  }

  test("all queries return rows on sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      // queries that cache intermediates (q78/q80/q81/q82, d03, d16, …)
      // must not leave blocks pinned — or their plans registered with
      // the CacheManager — for the rest of the shared test session
      graft.CacheRegistry.releaseAll()
      spark.catalog.clearCache()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with 0 rows: $empty")
  }
}
