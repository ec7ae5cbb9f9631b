package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val snap = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")

  private def apply(chg: Seq[(Long, Double, String, Long)]) =
    MergeOps.cdcApply(snap, chg.toDF("k", "v", "op", "seq"),
      keys = Seq("k"), ordering = Seq(col("seq").desc), opCol = "op")
      .as[(Long, Double)].collect().toSeq.sortBy(_._1)

  test("upsert updates matched keys and inserts new ones; delete removes") {
    val got = apply(Seq(
      (1L, 11.0, "U", 1L), // update existing
      (3L, 0.0, "D", 1L), // delete existing
      (4L, 40.0, "I", 1L))) // insert new key
    assert(got == Seq((1L, 11.0), (2L, 20.0), (4L, 40.0)))
  }

  test("latest change per key wins, older ops are superseded") {
    val got = apply(Seq(
      (1L, 99.0, "U", 1L), (1L, 11.0, "U", 5L), // later U wins
      (2L, 0.0, "D", 1L), (2L, 22.0, "U", 9L), // U after D: key survives
      (3L, 33.0, "U", 1L), (3L, 0.0, "D", 7L))) // D after U: key gone
    assert(got == Seq((1L, 11.0), (2L, 22.0)))
  }

  test("empty change batch is the identity") {
    assert(apply(Nil) == Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)))
  }

  test("changes missing snapshot columns fail loudly") {
    val e = intercept[IllegalArgumentException] {
      MergeOps.cdcApply(snap, Seq((1L, "U")).toDF("k", "op"),
        Seq("k"), Seq(col("k")), "op")
    }
    assert(e.getMessage.contains("v"))
  }

  test("a NULL op upserts (is not a silent delete)") {
    val chg = Seq((1L, 11.0, null: String, 1L), (4L, 40.0, null: String, 1L))
      .toDF("k", "v", "op", "seq")
    val got = MergeOps.cdcApply(snap, chg, Seq("k"), Seq(col("seq").desc), "op")
      .as[(Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, 11.0), (2L, 20.0), (3L, 30.0), (4L, 40.0)))
  }

  test("a NULL-key change replaces a NULL-key snapshot row, not duplicates it") {
    val snapN = Seq((Option(1L), 10.0), (Option.empty[Long], 99.0))
      .toDF("k", "v")
    val chg = Seq((Option.empty[Long], 7.0, "U", 1L)).toDF("k", "v", "op", "seq")
    val got = MergeOps.cdcApply(snapN, chg, Seq("k"), Seq(col("seq").desc), "op")
      .as[(Option[Long], Double)].collect().toSeq.sortBy(_._1.getOrElse(-1L))
    assert(got == Seq((None, 7.0), (Some(1L), 10.0)))
  }
}
