package graft

import scala.collection.mutable

import org.apache.spark.SparkContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ownership registry for caches created INSIDE library operators.
  *
  * Several operators cache an intermediate frame their plan consumes more
  * than once (LSH bucket tables, shingle frames, TF frames). The cache
  * must outlive the call — the returned DataFrame is lazy and the caller
  * decides when (and how often) to run it — so the operator cannot
  * unpersist before returning. Callers therefore own cleanup: run your
  * action(s), then call [[CacheRegistry.releaseAll]] (the Verify/Bench
  * harnesses do this between queries).
  *
  * Entries are scoped by the owning [[SparkSession]] (for RDDs, by their
  * [[SparkContext]]): `releaseAll(spark)` only unpersists caches created
  * through that session, so one harness thread cannot evict blocks a
  * concurrently running query on another session still depends on. The
  * no-argument `releaseAll()` drops every tracked entry regardless of
  * owner — correct only in the single-driver-thread, single-session
  * harness shape (Verify/Bench), which is the documented assumption for
  * that overload. Release is explicit and idempotent; re-registering
  * after release is fine.
  *
  * `localCheckpoint` storage is RDD-level and invisible to
  * `spark.catalog.clearCache()`, which is why RDDs are trackable here too.
  */
object CacheRegistry {
  private val frames = mutable.Buffer.empty[(SparkSession, DataFrame)]
  private val rdds = mutable.Buffer.empty[RDD[_]]

  /** Track a frame the library cached; returns it for chaining. */
  def track(df: DataFrame): DataFrame = synchronized {
    frames += ((df.sparkSession, df)); df
  }

  /** Track a persisted RDD (e.g. the backing RDD of a localCheckpoint). */
  def trackRdd(rdd: RDD[_]): Unit = synchronized { rdds += rdd }

  /** Unpersist everything the library cached since the last release,
    * regardless of owning session. Single-driver-thread harness use only
    * (see class doc); concurrent multi-session drivers must use the
    * session-scoped overload. Blocking=false: eviction proceeds
    * asynchronously, safe to continue submitting jobs.
    */
  def releaseAll(): Unit = synchronized {
    frames.foreach { case (_, f) =>
      try f.unpersist(false) catch { case _: Throwable => () }
    }
    frames.clear()
    rdds.foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
    rdds.clear()
  }

  /** Unpersist only the caches owned by `spark` (RDDs: owned by its
    * SparkContext), leaving other sessions' live caches untouched.
    */
  def releaseAll(spark: SparkSession): Unit = synchronized {
    val sc: SparkContext = spark.sparkContext
    val (mine, theirs) = frames.partition { case (s, _) => s eq spark }
    mine.foreach { case (_, f) =>
      try f.unpersist(false) catch { case _: Throwable => () }
    }
    frames.clear(); frames ++= theirs
    val (myRdds, otherRdds) = rdds.partition(_.sparkContext eq sc)
    myRdds.foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
    rdds.clear(); rdds ++= otherRdds
  }
}
