package graft

import scala.collection.mutable
import scala.util.control.NonFatal

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
  * Entries are scoped by the owning [[SparkSession]], recorded explicitly
  * at track time and matched by `sessionUUID` — a stable identifier, so
  * `releaseAll(spark)` works even when the caller holds a different
  * instance of the same logical session than the one the frame was built
  * with (e.g. `SparkSession.active` inside an operator). RDD entries
  * carry the same explicit owner: a `SparkContext` is shared across
  * `newSession`/`cloneSession` siblings, so context identity could not
  * distinguish their caches. One harness thread therefore cannot evict
  * blocks a concurrently running query on another session still depends
  * on. The no-argument `releaseAll()` drops every tracked entry
  * regardless of owner — correct only in the single-driver-thread,
  * single-session harness shape (Verify/Bench), which is the documented
  * assumption for that overload. Release is explicit and idempotent;
  * re-registering after release is fine.
  *
  * `localCheckpoint` storage is RDD-level and invisible to
  * `spark.catalog.clearCache()`, which is why RDDs are trackable here too.
  */
object CacheRegistry {
  private val frames = mutable.Buffer.empty[(String, DataFrame)]
  private val rdds = mutable.Buffer.empty[(String, RDD[_])]

  // sessionUUID is private[sql]; reached through the graftshim bridge
  private def uuidOf(s: SparkSession): String =
    org.apache.spark.sql.graftshim.Shim.sessionUUID(s)

  /** Track a frame the library cached; returns it for chaining. Owner is
    * the frame's own session.
    */
  def track(df: DataFrame): DataFrame = synchronized {
    frames += ((uuidOf(df.sparkSession), df)); df
  }

  /** Track a persisted RDD (e.g. the backing RDD of a localCheckpoint)
    * with its owning session, passed explicitly because an RDD only knows
    * its SparkContext — shared across `newSession` siblings, so not
    * enough to attribute ownership.
    */
  def trackRdd(rdd: RDD[_], owner: SparkSession): Unit = synchronized {
    rdds += ((uuidOf(owner), rdd))
  }

  // Unpersist must not abort cleanup on a flaky entry (e.g. a stopped
  // context), but fatal errors (OOM, interrupts) must propagate.
  private def quietly(u: => Unit): Unit =
    try u catch { case NonFatal(_) => () }

  /** Unpersist everything the library cached since the last release,
    * regardless of owning session. Single-driver-thread harness use only
    * (see class doc); concurrent multi-session drivers must use the
    * session-scoped overload. Blocking=false: eviction proceeds
    * asynchronously, safe to continue submitting jobs.
    */
  def releaseAll(): Unit = synchronized {
    frames.foreach { case (_, f) => quietly(f.unpersist(false)) }
    frames.clear()
    rdds.foreach { case (_, r) => quietly(r.unpersist(false)) }
    rdds.clear()
  }

  /** Unpersist only the caches owned by `spark` (matched by sessionUUID),
    * leaving other sessions' live caches untouched.
    */
  def releaseAll(spark: SparkSession): Unit = synchronized {
    val uuid = uuidOf(spark)
    val (mine, theirs) = frames.partition { case (u, _) => u == uuid }
    mine.foreach { case (_, f) => quietly(f.unpersist(false)) }
    frames.clear(); frames ++= theirs
    val (myRdds, otherRdds) = rdds.partition { case (u, _) => u == uuid }
    myRdds.foreach { case (_, r) => quietly(r.unpersist(false)) }
    rdds.clear(); rdds ++= otherRdds
  }
}
