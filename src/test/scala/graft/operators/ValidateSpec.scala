package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  // deliberately dirty frame: one NULL v, one out-of-range d, a
  // duplicated (k1, k2) key, and one orphan fk
  private val dirty = Seq(
    (1L, 1, Some(10.0), 0.5, 100L),
    (1L, 1, Some(20.0), 0.5, 100L), // dup key (1,1)
    (2L, 1, None, 0.5, 100L), // null v
    (3L, 1, Some(30.0), 1.5, 101L), // d out of [0,1]; fk 101 orphan
    (4L, 1, Some(40.0), 0.0, 100L))
    .toDF("k1", "k2", "v", "d", "fk")
  private val parent = Seq(100L).toDF("pk")

  private def metrics = Validate.report(dirty,
    scanChecks = Seq(Validate.Completeness("v"), Validate.InRange("d", 0.0, 1.0)),
    uniqueKey = Some(Seq("k1", "k2")),
    foreignKey = Some(("fk", parent, "pk")))
    .as[(String, Double, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("each check reports the exact violation metric and pass flag") {
    val m = metrics
    assert(m("completeness_v") == ((0.2, false)))
    assert(m("range_d") == ((1.0, false)))
    assert(m("uniqueness_k1_k2") == ((2.0, false)), m)
    assert(m("ri_fk") == ((1.0, false)))
    assert(m.size == 4)
  }

  test("a clean table passes every check") {
    val clean = Seq((1L, 1, Some(1.0), 0.1, 100L), (2L, 1, Some(2.0), 0.9, 100L))
      .toDF("k1", "k2", "v", "d", "fk")
    val rep = Validate.report(clean,
      Seq(Validate.Completeness("v"), Validate.InRange("d", 0.0, 1.0)),
      uniqueKey = Some(Seq("k1", "k2")),
      foreignKey = Some(("fk", parent, "pk")))
      .as[(String, Double, Boolean)].collect()
    assert(rep.length == 4)
    assert(rep.forall(_._3), rep.mkString(", "))
    assert(rep.forall(_._2 == 0.0))
  }

  test("all scan checks ride one aggregate (single scan of the input)") {
    val df = Validate.report(dirty, Seq(
      Validate.Completeness("v"), Validate.Completeness("d"),
      Validate.InRange("d", 0.0, 1.0), Validate.InRange("v", 0.0, 100.0)))
    val scans = df.queryExecution.sparkPlan.collect {
      case s if s.nodeName.contains("Scan") => s
    }
    assert(scans.size <= 1, s"expected one scan, got ${scans.size}")
  }

  test("empty check list is rejected") {
    intercept[IllegalArgumentException] { Validate.report(dirty, Nil) }
  }
}
