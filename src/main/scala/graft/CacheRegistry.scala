package graft

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame

/** Ownership registry for caches created INSIDE library operators.
  *
  * Several operators cache an intermediate frame their plan consumes more
  * than once (LSH bucket tables, shingle frames, TF frames). The cache
  * must outlive the call — the returned DataFrame is lazy and the caller
  * decides when (and how often) to run it — so the operator cannot
  * unpersist before returning. Callers therefore own cleanup: run your
  * action(s), then call [[CacheRegistry.releaseAll]] (the Verify/Bench
  * harnesses do this between queries). Entries are held weakly is not
  * needed: release is explicit and idempotent, and re-registering after
  * release is fine.
  *
  * `localCheckpoint` storage is RDD-level and invisible to
  * `spark.catalog.clearCache()`, which is why RDDs are trackable here too.
  */
object CacheRegistry {
  private val frames = mutable.Buffer.empty[DataFrame]
  private val rdds = mutable.Buffer.empty[RDD[_]]

  /** Track a frame the library cached; returns it for chaining. */
  def track(df: DataFrame): DataFrame = synchronized { frames += df; df }

  /** Track a persisted RDD (e.g. the backing RDD of a localCheckpoint). */
  def trackRdd(rdd: RDD[_]): Unit = synchronized { rdds += rdd }

  /** Unpersist everything the library cached since the last release.
    * Blocking=false: eviction proceeds asynchronously, safe to continue
    * submitting jobs.
    */
  def releaseAll(): Unit = synchronized {
    frames.foreach(f => try f.unpersist(false) catch { case _: Throwable => () })
    frames.clear()
    rdds.foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
    rdds.clear()
  }
}
