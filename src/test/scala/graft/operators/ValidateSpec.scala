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

  test("fact and dim sharing the key NAME still joins (aliased parent key)") {
    val parentSameName = Seq(100L).toDF("fk")
    val m = Validate.report(dirty, Seq(Validate.Completeness("v")),
      foreignKey = Some(("fk", parentSameName, "fk")))
      .as[(String, Double, Boolean)].collect().map(r => r._1 -> r._2).toMap
    assert(m("ri_fk") == 1.0)
  }

  test("NULL child keys are not orphans (SQL FK convention)") {
    val withNullFk = Seq((1L, Some(100L)), (2L, None), (3L, Some(200L)))
      .toDF("k", "fk")
    val m = Validate.report(withNullFk, Seq(Validate.Completeness("k")),
      foreignKey = Some(("fk", parent, "pk")))
      .as[(String, Double, Boolean)].collect().map(r => r._1 -> r._2).toMap
    assert(m("ri_fk") == 1.0, "only the 200 orphan counts; NULL is not one")
  }

  test("duplicate check names are rejected; suffix disambiguates bands") {
    val e = intercept[IllegalArgumentException] {
      Validate.report(dirty, Seq(
        Validate.InRange("d", 0.0, 1.0), Validate.InRange("d", 0.0, 100.0)))
    }
    assert(e.getMessage.contains("range_d"))
    val m = Validate.report(dirty, Seq(
      Validate.InRange("d", 0.0, 1.0),
      Validate.InRange("d", 0.0, 100.0, suffix = "_wide")))
      .as[(String, Double, Boolean)].collect().map(r => r._1 -> r._2).toMap
    assert(m("range_d") == 1.0 && m("range_d_wide") == 0.0)
  }

  test("empty input passes (zero rows have zero violations), not NULL-limbo") {
    val empty = dirty.filter(lit(false))
    val rep = Validate.report(empty,
      Seq(Validate.Completeness("v"), Validate.InRange("d", 0.0, 1.0)),
      uniqueKey = Some(Seq("k1", "k2")),
      foreignKey = Some(("fk", parent, "pk")))
      .as[(String, Double, Boolean)].collect()
    assert(rep.length == 4)
    assert(rep.forall(r => r._2 == 0.0 && r._3), rep.mkString(", "))
  }

  test("tolerance is per check, not a shared bar") {
    // a generous count tolerance on the range check must not make the
    // fraction-valued completeness check unfailable
    val m = Validate.report(dirty, Seq(
      Validate.Completeness("v"), // 0.2 nulls, tolerance 0 → fail
      Validate.InRange("d", 0.0, 1.0, tolerance = 5.0))) // 1 violation ≤ 5 → pass
      .as[(String, Double, Boolean)].collect().map(r => r._1 -> r._3).toMap
    assert(!m("completeness_v"))
    assert(m("range_d"))
  }
}
