package graft.operators

import java.sql.Timestamp
import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(11L)
  private def ts(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos((us % 1000000L).toInt * 1000)
    t
  }

  test("pointInInterval matches the naive range join on random data") {
    val base = 1700000000L * 1000000L
    val points = Seq.tabulate(300)(i =>
      (i.toLong, ts(base + rnd.nextInt(7200) * 1000000L)))
      .toDF("p_id", "p_ts")
    val intervals = Seq.tabulate(80) { i =>
      val s = base + rnd.nextInt(7200) * 1000000L
      (1000L + i, ts(s), ts(s + (60 + rnd.nextInt(1800)) * 1000000L))
    }.toDF("i_id", "w_start", "w_end")

    val bucketed = RangeJoin.pointInInterval(
      points, "p_ts", intervals, "w_start", "w_end", bucketSec = 600)
      .select("p_id", "i_id").as[(Long, Long)].collect().toSorted
    val naive = points.join(intervals,
      col("p_ts") >= col("w_start") && col("p_ts") <= col("w_end"))
      .select("p_id", "i_id").as[(Long, Long)].collect().toSorted
    assert(bucketed == naive)
    assert(naive.nonEmpty)
    // exactly-once: no dedup is applied, so multiplicity must match too
    assert(bucketed.size == bucketed.distinct.size)
  }

  test("pointInInterval plans as a hash join, not BroadcastNestedLoopJoin") {
    val points = Seq((1L, ts(1700000000L * 1000000L))).toDF("p_id", "p_ts")
    val intervals = Seq((2L, ts(1700000000L * 1000000L), ts(1700000300L * 1000000L)))
      .toDF("i_id", "w_start", "w_end")
    val plan = RangeJoin.pointInInterval(
      points, "p_ts", intervals, "w_start", "w_end", bucketSec = 600)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Generate"), plan) // the interval cell explode
  }

  test("inclusive bounds: points exactly on start/end match") {
    val s = 1700000000L * 1000000L
    val points = Seq((1L, ts(s)), (2L, ts(s + 600000000L)), (3L, ts(s + 600000001L)))
      .toDF("p_id", "p_ts")
    val intervals = Seq((9L, ts(s), ts(s + 600000000L))).toDF("i_id", "w_start", "w_end")
    val got = RangeJoin.pointInInterval(
      points, "p_ts", intervals, "w_start", "w_end", bucketSec = 60)
      .select("p_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("reserved internal column names are rejected up front") {
    val s = 1700000000L * 1000000L
    val badPoints = Seq((1L, ts(s))).toDF("__cell", "p_ts")
    val intervals = Seq((9L, ts(s), ts(s + 1000000L))).toDF("i_id", "w_start", "w_end")
    val e1 = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(badPoints, "p_ts", intervals, "w_start", "w_end", 60)
    }
    assert(e1.getMessage.contains("__cell"))
    val points = Seq((1L, ts(s))).toDF("p_id", "p_ts")
    val badIv = Seq((9L, ts(s), ts(s + 1000000L))).toDF("__c1", "w_start", "w_end")
    val e2 = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, "p_ts", badIv, "w_start", "w_end", 60)
    }
    assert(e2.getMessage.contains("__c1"))
  }

  test("inverted intervals (end < start) match nothing instead of exploding") {
    val s = 1700000000L * 1000000L
    val points = Seq((1L, ts(s))).toDF("p_id", "p_ts")
    // the inverted row spans ±1 year: unguarded, sequence(c0, c1) would
    // descend through ~10^6 spurious minute cells before the join
    val intervals = Seq(
      (8L, ts(s + 86400L * 365 * 1000000L), ts(s - 86400L * 365 * 1000000L)),
      (9L, ts(s - 1000000L), ts(s + 1000000L))).toDF("i_id", "w_start", "w_end")
    val got = RangeJoin.pointInInterval(
      points, "p_ts", intervals, "w_start", "w_end", bucketSec = 60)
      .select("i_id").as[Long].collect().toSeq
    assert(got == Seq(9L))
  }

  test("pre-1970 timestamps bucket by exact floor (negative microseconds)") {
    // pmod-based flooring must put -1 µs in the cell BELOW zero, not cell
    // zero: a point 1 µs before the epoch lies inside an interval ending
    // at the epoch and outside one starting there only if both sides
    // floor identically. (The shared ts() helper truncates toward zero,
    // which is wrong for negative micros — floor here.)
    def ts(us: Long): Timestamp = {
      val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos(Math.floorMod(us, 1000000L).toInt * 1000)
      t
    }
    val points = Seq(
      (1L, ts(-1L)), // 1969-12-31 23:59:59.999999
      (2L, ts(0L)), // epoch
      (3L, ts(-60000000L))) // one minute before
      .toDF("p_id", "p_ts")
    val intervals = Seq(
      (10L, ts(-120000000L), ts(0L)), // [-2 min, epoch]
      (11L, ts(0L), ts(60000000L))) // [epoch, +1 min]
      .toDF("i_id", "w_start", "w_end")
    val got = RangeJoin.pointInInterval(
      points, "p_ts", intervals, "w_start", "w_end", bucketSec = 60)
      .select("p_id", "i_id").as[(Long, Long)].collect().toSorted
    assert(got == Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 10L)))
  }

  test("intervalOverlap matches the naive overlap join, each pair exactly once") {
    val base = 1700000000L * 1000000L
    // long intervals vs a coarse-ish bucket: most overlapping pairs share
    // SEVERAL cells, so the exactly-once claim is actually exercised
    val left = Seq.tabulate(120) { i =>
      val s = base + rnd.nextInt(7200) * 1000000L
      (i.toLong, i.toLong % 5, ts(s), ts(s + (300 + rnd.nextInt(3600)) * 1000000L))
    }.toDF("l_id", "k", "l_start", "l_end")
    val right = Seq.tabulate(120) { i =>
      val s = base + rnd.nextInt(7200) * 1000000L
      (1000L + i, i.toLong % 5, ts(s), ts(s + (300 + rnd.nextInt(3600)) * 1000000L))
    }.toDF("r_id", "k", "r_start", "r_end")

    val bucketed = RangeJoin.intervalOverlap(
      left, "l_start", "l_end", right, "r_start", "r_end",
      keys = Seq("k"), bucketSec = 600)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSorted
    val naive = left.join(right.withColumnRenamed("k", "k2"),
      col("k") === col("k2") &&
        col("l_start") <= col("r_end") && col("r_start") <= col("l_end"))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSorted
    assert(bucketed == naive)
    assert(naive.nonEmpty)
    // the cell-ownership filter must replace dedup entirely: multiplicity 1
    assert(bucketed.size == bucketed.distinct.size)
  }

  test("intervalOverlap plans as a hash join with no post-join dedup") {
    val s0 = 1700000000L * 1000000L
    val left = Seq((1L, 0L, ts(s0), ts(s0 + 3600000000L))).toDF("l_id", "k", "l_start", "l_end")
    val right = Seq((2L, 0L, ts(s0), ts(s0 + 3600000000L))).toDF("r_id", "k", "r_start", "r_end")
    val df = RangeJoin.intervalOverlap(
      left, "l_start", "l_end", right, "r_start", "r_end", Seq("k"), 600)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // dedup is the codegen'd owner-cell filter, not a shuffling Distinct
    assert(!df.queryExecution.optimizedPlan.toString.contains("Deduplicate"), plan)
  }

  test("intervalOverlap: touching endpoints overlap, disjoint intervals do not") {
    val s0 = 1700000000L * 1000000L
    val left = Seq((1L, 0L, ts(s0), ts(s0 + 600000000L))).toDF("l_id", "k", "l_start", "l_end")
    val right = Seq(
      (10L, 0L, ts(s0 + 600000000L), ts(s0 + 700000000L)), // touches l_end
      (11L, 0L, ts(s0 + 600000001L), ts(s0 + 700000000L)), // 1 µs past: disjoint
      (12L, 0L, ts(s0 - 700000000L), ts(s0)), // touches l_start from below
      (13L, 1L, ts(s0), ts(s0 + 600000000L))) // wrong key
      .toDF("r_id", "k", "r_start", "r_end")
    val got = RangeJoin.intervalOverlap(
      left, "l_start", "l_end", right, "r_start", "r_end", Seq("k"), 60)
      .select("r_id").as[Long].collect().toSet
    assert(got == Set(10L, 12L))
  }

  test("intervalOverlap rejects the OTHER side's internals too (they meet in the join)") {
    val s0 = 1700000000L * 1000000L
    // left carrying the RIGHT side's internal name would survive its own
    // side's plumbing and collide after the join
    val left = Seq((1L, 0L, ts(s0), ts(s0))).toDF("__rs_us", "k", "l_start", "l_end")
    val right = Seq((2L, 0L, ts(s0), ts(s0))).toDF("r_id", "k", "r_start", "r_end")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(left, "l_start", "l_end", right, "r_start", "r_end", Seq("k"), 60)
    }
    assert(e.getMessage.contains("__rs_us"))
  }

  test("intervalOverlap rejects reserved names and drops inverted intervals") {
    val s0 = 1700000000L * 1000000L
    val bad = Seq((1L, 0L, ts(s0), ts(s0))).toDF("__ls_us", "k", "l_start", "l_end")
    val right = Seq((2L, 0L, ts(s0), ts(s0))).toDF("r_id", "k", "r_start", "r_end")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(bad, "l_start", "l_end", right, "r_start", "r_end", Seq("k"), 60)
    }
    assert(e.getMessage.contains("__ls_us"))
    val left = Seq(
      (1L, 0L, ts(s0), ts(s0 + 1000000L)),
      (2L, 0L, ts(s0 + 86400L * 365 * 1000000L), ts(s0 - 86400L * 365 * 1000000L)))
      .toDF("l_id", "k", "l_start", "l_end")
    val got = RangeJoin.intervalOverlap(
      left, "l_start", "l_end", right, "r_start", "r_end", Seq("k"), 60)
      .select("l_id").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }

  private implicit class SortedOps(a: Array[(Long, Long)]) {
    def toSorted: Seq[(Long, Long)] = a.toSeq.sorted
  }
}
