package graft.operators

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.Sessionize

/** Randomized differential tests: seeded random inputs, distributed
  * operator vs an obviously-correct brute-force reference. Catches edge
  * cases (ties, duplicates, boundary gaps) that hand-picked fixtures
  * miss, while staying deterministic (fixed seed).
  */
class DifferentialSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20260812L)

  test("asofJoin equals the brute-force per-row as-of lookup on random data") {
    for (_ <- 1 to 3) {
      val nUsers = 4
      val clicks = Seq.tabulate(60) { i =>
        (rnd.nextInt(nUsers).toLong, new Timestamp(rnd.nextInt(1000) * 1000L), i.toLong)
      } // (user, ts, click_id) — dedup to one click per (user, ts), max id
        .groupBy(c => (c._1, c._2)).map(_._2.maxBy(_._3)).toSeq
      val purchases = Seq.tabulate(40) { i =>
        (rnd.nextInt(nUsers + 1).toLong, new Timestamp(rnd.nextInt(1000) * 1000L), (1000 + i).toLong)
      }
      val expected = purchases.map { case (u, ts, pid) =>
        val best = clicks.filter(c => c._1 == u && !c._2.after(ts))
          .sortBy(c => (c._2.getTime, c._3)).lastOption
        pid -> best.map(_._3)
      }.toMap

      val out = AsOf.asofJoin(
        purchases.toDF("user_id", "ts", "purchase_id"),
        clicks.toDF("user_id", "ts", "click_id"),
        "user_id", "ts", valueCols = Seq("click_id"))
        .select("purchase_id", "asof_click_id")
        .as[(Long, Option[Long])].collect().toMap
      assert(out == expected)
    }
  }

  test("asofJoinForward equals the brute-force next-at-or-after lookup on random data") {
    for (_ <- 1 to 3) {
      val nUsers = 4
      val clicks = Seq.tabulate(60) { i =>
        (rnd.nextInt(nUsers).toLong, new Timestamp(rnd.nextInt(1000) * 1000L), i.toLong)
      }.groupBy(c => (c._1, c._2)).map(_._2.maxBy(_._3)).toSeq
      val purchases = Seq.tabulate(40) { i =>
        (rnd.nextInt(nUsers + 1).toLong, new Timestamp(rnd.nextInt(1000) * 1000L), (1000 + i).toLong)
      }
      // earliest click at or after the purchase (inclusive boundary)
      val expected = purchases.map { case (u, ts, pid) =>
        val best = clicks.filter(c => c._1 == u && !c._2.before(ts))
          .sortBy(c => (c._2.getTime, c._3)).headOption
        pid -> best.map(_._3)
      }.toMap

      val out = AsOf.asofJoinForward(
        purchases.toDF("user_id", "ts", "purchase_id"),
        clicks.toDF("user_id", "ts", "click_id"),
        "user_id", "ts", valueCols = Seq("click_id"))
        .select("purchase_id", "asof_click_id")
        .as[(Long, Option[Long])].collect().toMap
      assert(out == expected)
    }
  }

  test("as-of NULL semantics: NULL keys and NULL times match nothing on either side") {
    val clicks = Seq(
      (Some(1L), Some(new Timestamp(100000L)), 10L),
      (Some(1L), None, 99L), // NULL-ts right row: unmatchable
      (None, Some(new Timestamp(100000L)), 98L)) // NULL-key right row: unmatchable
      .toDF("user_id", "ts", "click_id")
    val purchases = Seq(
      (Some(1L), Some(new Timestamp(200000L)), 1000L),
      (Some(1L), None, 1001L), // NULL-ts probe: matches nothing
      (None, Some(new Timestamp(200000L)), 1002L)) // NULL-key probe: matches nothing
      .toDF("user_id", "ts", "purchase_id")
    for (fwd <- Seq(false, true)) {
      val fn = if (fwd) AsOf.asofJoinForward _ else AsOf.asofJoin _
      val out = fn(purchases, clicks, "user_id", "ts", Seq("click_id"))
        .select("purchase_id", "asof_click_id")
        .as[(Long, Option[Long])].collect().toMap
      assert(out(1001L).isEmpty, s"fwd=$fwd: NULL-ts probe must not match")
      assert(out(1002L).isEmpty, s"fwd=$fwd: NULL-key probe must not match")
      val expected = if (fwd) None else Some(10L)
      assert(out(1000L) == expected, s"fwd=$fwd")
    }
  }

  test("as-of rejects reserved and colliding output column names, case-insensitively") {
    val clicks = Seq((1L, new Timestamp(1000L), 10L)).toDF("user_id", "ts", "click_id")
    val badSide = Seq((1L, new Timestamp(1000L), 1L)).toDF("user_id", "ts", "__Side")
    val e1 = intercept[IllegalArgumentException] {
      AsOf.asofJoin(badSide, clicks, "user_id", "ts", Seq("click_id"))
    }
    assert(e1.getMessage.contains("__Side"))
    val badOut = Seq((1L, new Timestamp(1000L), 5L)).toDF("user_id", "ts", "asof_click_id")
    val e2 = intercept[IllegalArgumentException] {
      AsOf.asofJoin(badOut, clicks, "user_id", "ts", Seq("click_id"))
    }
    assert(e2.getMessage.contains("asof_click_id"))
  }

  test("as-of carries all value columns from ONE right row (atomic struct)") {
    // right rows: at t1 v1 is genuinely NULL; at t2 both set. A forward
    // probe before t1 must report (NULL, a) from the t1 row — not
    // fabricate (x, a) by pulling v1 from the t2 row.
    val right = Seq(
      (1L, new Timestamp(100000L), Option.empty[Long], Some("a")),
      (1L, new Timestamp(200000L), Some(7L), Some("b")))
      .toDF("user_id", "ts", "v1", "v2")
    val left = Seq((1L, new Timestamp(50000L), 1000L))
      .toDF("user_id", "ts", "purchase_id")
    val fwd = AsOf.asofJoinForward(left, right, "user_id", "ts",
      Seq("v1", "v2"))
      .select("asof_v1", "asof_v2").as[(Option[Long], Option[String])].collect().head
    assert(fwd == ((None, Some("a"))), fwd)
    // mirror case backward: probe after t2 where v2 is NULL on the
    // nearest row
    val right2 = Seq(
      (1L, new Timestamp(100000L), Some(7L), Some("b")),
      (1L, new Timestamp(200000L), Some(9L), Option.empty[String]))
      .toDF("user_id", "ts", "v1", "v2")
    val bwd = AsOf.asofJoin(
      Seq((1L, new Timestamp(300000L), 1000L)).toDF("user_id", "ts", "purchase_id"),
      right2, "user_id", "ts", Seq("v1", "v2"))
      .select("asof_v1", "asof_v2").as[(Option[Long], Option[String])].collect().head
    assert(bwd == ((Some(9L), None)), bwd)
  }

  test("connected components equal brute-force union-find on random graphs") {
    for (_ <- 1 to 3) {
      val nNodes = 40
      val edges = Seq.fill(25)((rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
        .filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
        .distinct
      // brute-force union-find with min-root canonicalization
      val parent = Array.tabulate(nNodes)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until nNodes).map(i => i.toLong -> find(i).toLong).toMap

      val docs = (0 until nNodes).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
      val out = graft.similarity.ConnectedComponents
        .dupClusters(docs, edges.toDF("doc_a", "doc_b"))
        .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
      assert(out == expected)
    }
  }

  test("skyline equals the brute-force dominance filter on random data") {
    for (_ <- 1 to 3) {
      val pts = Seq.tabulate(200)(i =>
        (i.toLong, rnd.nextInt(30).toDouble, rnd.nextInt(30).toDouble))
      val expected = pts.filter { case (_, x, y) =>
        !pts.exists { case (_, bx, by) =>
          bx >= x && by <= y && (bx > x || by < y)
        }
      }.map(_._1).toSet
      val out = Skyline.maxMin(pts.toDF("id", "x", "y"), "x", "y")
        .select("id").as[Long].collect().toSet
      graft.CacheRegistry.releaseAll()
      assert(out == expected)
    }
  }

  test("skyline on adversarial data (frontier = every point) survives the parallel merge") {
    // For max-x/min-y dominance, two points are mutually non-dominating
    // iff the higher-x one also has higher y — so y = x + 1 makes the
    // frontier ALL n points ("anti-correlated" w.r.t. the preference
    // directions): the adversarial shape where a single-task merge would
    // hold the whole dataset. Duplicated frontier points (equal x, equal
    // y, scattered across input partitions) must all be kept, and filler
    // points sitting 2 above the frontier line (dominated by the equal-x
    // frontier point) must all go.
    val n = 3000
    val frontier = Seq.tabulate(n)(i => (i.toLong, i.toDouble, (i + 1).toDouble))
    val dupes = Seq.tabulate(50) { i =>
      val v = i * 7 % n; (10000L + i, v.toDouble, (v + 1).toDouble)
    }
    val dominated = Seq.tabulate(500) { i =>
      val v = i % n; (20000L + i, v.toDouble, (v + 3).toDouble)
    }
    val all = rnd.shuffle(frontier ++ dupes ++ dominated)
    val out = Skyline.maxMin(all.toDF("id", "x", "y").repartition(16), "x", "y")
      .select("id").as[Long].collect().toSet
    graft.CacheRegistry.releaseAll()
    assert(out == (frontier ++ dupes).map(_._1).toSet)
  }

  test("Sessionize fold equals the relational gap-split reference on random data") {
    for (_ <- 1 to 3) {
      val gapMs = 60000L
      val times = Seq.fill(50)(rnd.nextInt(3000).toLong * 1000L).distinct.sorted
      val events = times.zipWithIndex.map { case (t, i) =>
        Sessionize.Event(i.toLong, new Timestamp(t), 1L, "click", 1.0)
      }
      // reference: split when gap > gapMs (strictly), matching q32
      val sessions = events.foldLeft(List.empty[List[Long]]) { (acc, e) =>
        acc match {
          case head :: tail if e.ts.getTime - head.last <= gapMs =>
            (head :+ e.ts.getTime) :: tail
          case _ => List(e.ts.getTime) :: acc
        }
      }
      val expectedClosed = sessions.reverse.dropRight(1) // last session stays open
        .map(s => (s.head, s.last, s.size.toLong))

      val out = Sessionize.sessionize(events.toDS(), gapSeconds = 60)
        .collect()
        .sortBy(_.session_start.getTime)
        .map(s => (s.session_start.getTime, s.session_end.getTime, s.n_events))
        .toSeq
      assert(out == expectedClosed)
    }
  }
}
