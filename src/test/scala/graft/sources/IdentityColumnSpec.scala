package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** TxLog identity columns — GENERATED ALWAYS AS IDENTITY with a
  * transactional high-water mark (q120).
  */
class IdentityColumnSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-ident").resolve("t").toString

  test("appends omit the column and receive contiguous unique ids") {
    val t = tmpTable()
    TxLog.overwrite(Seq((0L, "seed")).toDF("id", "v"), t)
    TxLog.setIdentityColumn(spark, t, "id", start = 100L)
    // seed max (0) < start: allocation begins at start
    TxLog.append(Seq("a", "b", "c").toDF("v").repartition(3), t)
    TxLog.append(Seq("d", "e").toDF("v"), t)
    val got = TxLog.read(spark, t).as[(Long, String)].collect().toMap
    assert(got.size == 6)
    assert(got.keySet == Set(0L, 100L, 101L, 102L, 103L, 104L))
    // the 2nd batch got the NEXT contiguous range
    assert(Set(got(103L), got(104L)) == Set("d", "e"))
    assert(TxLog.identityOf(spark, t)("id") == TxLog.IdentitySpec(1L, 105L))
  }

  test("allocation seeds above existing ids; step respected") {
    val t = tmpTable()
    TxLog.overwrite(Seq((7000L, "x")).toDF("id", "v"), t)
    TxLog.setIdentityColumn(spark, t, "id", start = 1L, step = 10L)
    TxLog.append(Seq("a", "b").toDF("v"), t)
    val ids = TxLog.read(spark, t).as[(Long, String)].collect().map(_._1).toSet
    assert(ids == Set(7000L, 7001L, 7011L))
  }

  test("explicit identity values are refused (ALWAYS semantics)") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "x")).toDF("id", "v"), t)
    TxLog.setIdentityColumn(spark, t, "id")
    val e = intercept[IllegalArgumentException] {
      TxLog.append(Seq((99L, "bad")).toDF("id", "v"), t)
    }
    assert(e.getMessage.contains("GENERATED ALWAYS AS IDENTITY"))
  }

  test("racing identity appends never hand out the same id") {
    val t = tmpTable()
    TxLog.overwrite(Seq((0L, "seed")).toDF("id", "v"), t)
    TxLog.setIdentityColumn(spark, t, "id")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (1 to 4).map { i =>
      Future { TxLog.append(Seq(s"w$i-1", s"w$i-2").toDF("v"), t) }
    }
    Await.result(Future.sequence(fs), 120.seconds)
    val ids = TxLog.read(spark, t).as[(Long, String)].collect().map(_._1)
    assert(ids.length == 9)
    assert(ids.distinct.length == 9, "duplicate identity values under race")
    assert(TxLog.identityOf(spark, t)("id").next == 9L)
  }

  test("declarations guard: type, duplicates, drop ordering") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "x", 5)).toDF("id", "v", "n"), t)
    intercept[IllegalArgumentException] {
      TxLog.setIdentityColumn(spark, t, "n") // int, not bigint
    }
    TxLog.setIdentityColumn(spark, t, "id")
    intercept[IllegalArgumentException] {
      TxLog.setIdentityColumn(spark, t, "id")
    }
    intercept[IllegalArgumentException] { TxLog.dropColumn(spark, t, "id") }
    TxLog.dropIdentityColumn(spark, t, "id")
    TxLog.dropColumn(spark, t, "id")
    assert(TxLog.read(spark, t).schema.fieldNames.toSeq == Seq("v", "n"))
  }
}
