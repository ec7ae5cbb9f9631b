package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSpec

/** TxLog generated columns — the Delta `GENERATED ALWAYS AS` surface
  * (q118): omitted columns computed on write, provided ones validated,
  * UPDATE recomputes after source assignments.
  */
class GeneratedColumnsSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-gencol").resolve("t").toString

  test("declaration validates existing rows and rejects divergence") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, 10L, 20L)).toDF("k", "a", "a2"), t)
    TxLog.setGeneratedColumn(spark, t, "a2", "a * 2")
    assert(TxLog.generatedOf(spark, t) == Map("a2" -> "a * 2"))
    val t2 = tmpTable()
    TxLog.overwrite(Seq((1L, 10L, 99L)).toDF("k", "a", "a2"), t2)
    val e = intercept[IllegalArgumentException] {
      TxLog.setGeneratedColumn(spark, t2, "a2", "a * 2")
    }
    assert(e.getMessage.contains("diverge"))
  }

  test("appends compute an omitted generated column") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, 5L, 10L)).toDF("k", "a", "a2"), t)
    TxLog.setGeneratedColumn(spark, t, "a2", "a * 2")
    TxLog.append(Seq((2L, 7L)).toDF("k", "a"), t)
    assert(TxLog.read(spark, t).as[(Long, Long, Long)].collect().toSet ==
      Set((1L, 5L, 10L), (2L, 7L, 14L)))
  }

  test("a provided generated value is validated row by row") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, 5L, 10L)).toDF("k", "a", "a2"), t)
    TxLog.setGeneratedColumn(spark, t, "a2", "a * 2")
    TxLog.append(Seq((2L, 3L, 6L)).toDF("k", "a", "a2"), t) // consistent: ok
    intercept[Exception] {
      TxLog.append(Seq((3L, 4L, 99L)).toDF("k", "a", "a2"), t)
    }
    assert(TxLog.read(spark, t).count() == 2L)
  }

  test("the canonical use: generated partition column prunes exactly") {
    val t = tmpTable()
    val df = Seq((1L, "2024-03-01", 2024), (2L, "2025-07-09", 2025))
      .toDF("k", "d", "yr")
    TxLog.overwrite(df, t, partitionBy = Some(Seq("yr")))
    TxLog.setGeneratedColumn(spark, t, "yr", "CAST(substring(d, 1, 4) AS INT)")
    // writers state only the date; the layout column derives
    TxLog.append(Seq((3L, "2025-12-31")).toDF("k", "d"), t)
    val p = TxLog.readPartition(spark, t, Map("yr" -> 2025))
    assert(p.select("k").as[Long].collect().toSet == Set(2L, 3L))
    assert(p.inputFiles.nonEmpty &&
      p.inputFiles.forall(_.contains("__gp_yr=2025")))
  }

  test("UPDATE recomputes generated columns and rejects assigning them") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, 5L, 10L), (2L, 8L, 16L)).toDF("k", "a", "a2"), t)
    TxLog.setGeneratedColumn(spark, t, "a2", "a * 2")
    TxLog.update(spark, t, col("k") === 1L, Seq("a" -> lit(50L)))
    assert(TxLog.read(spark, t).as[(Long, Long, Long)].collect().toSet ==
      Set((1L, 50L, 100L), (2L, 8L, 16L)))
    val e = intercept[IllegalArgumentException] {
      TxLog.update(spark, t, col("k") === 2L, Seq("a2" -> lit(0L)))
    }
    assert(e.getMessage.contains("generated"))
    // the DV update path recomputes too
    TxLog.update(spark, t, col("k") === 2L, Seq("a" -> lit(9L)),
      deletionVectors = true)
    assert(TxLog.read(spark, t).as[(Long, Long, Long)].collect().toSet ==
      Set((1L, 50L, 100L), (2L, 9L, 18L)))
  }

  test("mid-schema generated + identity columns compose on one append") {
    val t = tmpTable()
    // generated column sits in the MIDDLE of the schema: the computed
    // columns come back in declared order, not appended at the end
    TxLog.overwrite(Seq((1L, 10L, 20L, "x")).toDF("id", "a", "a2", "v"), t)
    TxLog.setGeneratedColumn(spark, t, "a2", "a * 2")
    TxLog.setIdentityColumn(spark, t, "id")
    TxLog.append(Seq((7L, "y")).toDF("a", "v"), t) // omits id AND a2
    assert(TxLog.read(spark, t).as[(Long, Long, Long, String)]
      .collect().toSet == Set((1L, 10L, 20L, "x"), (2L, 7L, 14L, "y")))
  }

  test("drop stops computing; clone carries the declaration") {
    val t = tmpTable(); val c = tmpTable()
    TxLog.overwrite(Seq((1L, 5L, 10L)).toDF("k", "a", "a2"), t)
    TxLog.setGeneratedColumn(spark, t, "a2", "a * 2")
    TxLog.clone(spark, t, c)
    assert(TxLog.generatedOf(spark, c) == Map("a2" -> "a * 2"))
    TxLog.append(Seq((2L, 6L)).toDF("k", "a"), c) // clone computes too
    assert(TxLog.read(spark, c).as[(Long, Long, Long)].collect().toSet ==
      Set((1L, 5L, 10L), (2L, 6L, 12L)))
    TxLog.dropGeneratedColumn(spark, t, "a2")
    assert(TxLog.generatedOf(spark, t).isEmpty)
    // without the declaration an omitting append is plain schema drift
    intercept[Exception] { TxLog.append(Seq((3L, 7L)).toDF("k", "a"), t) }
  }
}
