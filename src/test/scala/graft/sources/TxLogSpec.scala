package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class TxLogSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-txlog").resolve("t").toString

  test("overwrite + read round-trips content and schema") {
    val t = tmpTable()
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    assert(TxLog.overwrite(df, t) == 1L)
    val got = TxLog.read(spark, t)
    // parquet reads are nullable-normalized; names and types round-trip
    assert(got.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(got.as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
  }

  test("append unions with the parent snapshot; versions are sequential") {
    val t = tmpTable()
    assert(TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t) == 1L)
    assert(TxLog.append(Seq((2L, "b")).toDF("k", "v"), t) == 2L)
    assert(TxLog.append(Seq((3L, "c")).toDF("k", "v"), t) == 3L)
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(TxLog.versions(spark, t) == Seq(1L, 2L, 3L))
  }

  test("time travel: readAsOf(N-1) after an overwrite sees the old table") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "old")).toDF("k", "v"), t)
    TxLog.overwrite(Seq((9L, "new")).toDF("k", "v"), t)
    assert(TxLog.readAsOf(spark, t, 1L).as[(Long, String)].collect().toSeq ==
      Seq((1L, "old")))
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSeq ==
      Seq((9L, "new")))
    val e = intercept[IllegalArgumentException] { TxLog.readAsOf(spark, t, 7L) }
    assert(e.getMessage.contains("no version 7"))
  }

  test("snapshot isolation: a resolved reader survives a concurrent overwrite") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "old")).toDF("k", "v"), t)
    val pinned = TxLog.read(spark, t) // resolves version 1's file list
    TxLog.overwrite(Seq((9L, "new")).toDF("k", "v"), t)
    // the overwrite added a manifest + new files; version 1's files are
    // untouched, so the pinned frame still returns the old rows
    assert(pinned.as[(Long, String)].collect().toSeq == Seq((1L, "old")))
  }

  test("mid-commit state is invisible: tmp manifests and unreferenced data dirs") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t)
    // simulate a crashed commit: data files written, manifest still .tmp
    Seq((2L, "ghost")).toDF("k", "v").write
      .parquet(s"$t/data/crashed-commit")
    Files.write(java.nio.file.Paths.get(s"$t/_txlog/.tmp-crashed.json"),
      "{\"not\":\"a manifest\"}".getBytes("UTF-8"))
    assert(TxLog.versions(spark, t) == Seq(1L))
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSeq ==
      Seq((1L, "a")))
  }

  test("vacuum drops only files no kept version references") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t) // v1 files
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t) // v2 = v1 + new
    TxLog.overwrite(Seq((9L, "z")).toDF("k", "v"), t) // v3: fresh only
    val deleted = TxLog.vacuum(spark, t, keepVersions = 1)
    // v1/v2's files are unreferenced by v3 and must be gone
    assert(deleted.nonEmpty)
    val f = new java.io.File(t)
    deleted.foreach(rel => assert(!new java.io.File(f, rel).exists(), rel))
    assert(TxLog.versions(spark, t) == Seq(3L))
    intercept[IllegalArgumentException] { TxLog.readAsOf(spark, t, 2L) }
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSeq ==
      Seq((9L, "z")))
  }

  test("vacuum keeps files shared between dropped and kept versions") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t) // v1
    TxLog.append(Seq((2L, "b")).toDF("k", "v"), t) // v2 references v1's files
    TxLog.vacuum(spark, t, keepVersions = 1) // drops v1's manifest only
    // v1's data files are still referenced by v2 and must survive
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
  }

  test("empty dataframe commits and reads back empty with schema") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v").limit(0), t)
    val got = TxLog.read(spark, t)
    assert(got.count() == 0)
    assert(got.columns.toSeq == Seq("k", "v"))
  }

  test("append with a drifted schema is rejected") {
    val t = tmpTable()
    TxLog.overwrite(Seq((1L, "a")).toDF("k", "v"), t)
    val e = intercept[IllegalArgumentException] {
      TxLog.append(Seq((2L, 3.5)).toDF("k", "other"), t)
    }
    assert(e.getMessage.contains("schema mismatch"))
    // overwrite MAY change the schema
    TxLog.overwrite(Seq((2L, 3.5)).toDF("k", "other"), t)
    assert(TxLog.read(spark, t).columns.toSeq == Seq("k", "other"))
  }

  test("reading a never-committed table fails loudly") {
    val e = intercept[RuntimeException] { TxLog.read(spark, tmpTable()) }
    assert(e.getMessage.contains("no committed versions"))
  }
}
