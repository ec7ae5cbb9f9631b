package graft

import org.apache.spark.storage.StorageLevel

/** Session-scoping contract of the cache ownership registry: releasing
  * one session's caches must not evict a sibling session's, even though
  * `newSession` siblings share one SparkContext (so RDD ownership cannot
  * be inferred from the context — it is recorded at track time).
  */
class CacheRegistrySpec extends SparkSpec {

  test("releaseAll(session) frees only that session's frames and RDDs") {
    val other = spark.newSession()
    CacheRegistry.releaseAll() // clean slate (suites run sequentially)

    val mine = spark.range(100).toDF("x").cache()
    mine.count()
    CacheRegistry.track(mine)
    // a DIFFERENT plan than `mine`: the shared CacheManager uncaches by
    // plan equality, so an identical plan would be evicted alongside it
    // regardless of session
    val theirs = other.range(200).toDF("x").cache()
    theirs.count()
    CacheRegistry.track(theirs)
    // owned by `other` but living on the shared context
    val theirRdd = spark.sparkContext.parallelize(1 to 100)
      .persist(StorageLevel.MEMORY_ONLY)
    theirRdd.count()
    CacheRegistry.trackRdd(theirRdd, other)

    CacheRegistry.releaseAll(spark)
    assert(mine.storageLevel == StorageLevel.NONE)
    assert(theirs.storageLevel != StorageLevel.NONE,
      "sibling session's frame must survive")
    assert(theirRdd.getStorageLevel != StorageLevel.NONE,
      "sibling session's RDD must survive despite the shared SparkContext")

    CacheRegistry.releaseAll(other)
    assert(theirs.storageLevel == StorageLevel.NONE)
    assert(theirRdd.getStorageLevel == StorageLevel.NONE)
  }

  test("release is idempotent and re-tracking after release works") {
    CacheRegistry.releaseAll()
    val df = spark.range(10).toDF("x").cache()
    df.count()
    CacheRegistry.track(df)
    CacheRegistry.releaseAll(spark)
    CacheRegistry.releaseAll(spark) // second release: no-op, no throw
    assert(df.storageLevel == StorageLevel.NONE)
    CacheRegistry.track(df.cache())
    df.count()
    CacheRegistry.releaseAll()
    assert(df.storageLevel == StorageLevel.NONE)
  }
}
