package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec

/** COPY INTO-class idempotent ingest (TxLog.copyInto, q135): a landing
  * directory's files adopted into the table with each source file
  * committed at most once across runs — the ledger rides the manifest,
  * a no-op run commits nothing, corrupt rows quarantine or fail.
  */
class CopyIntoSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-$tag").toString

  private def tmpTable(): String =
    Files.createTempDirectory("graft-copy").resolve("t").toString

  test("each landing file lands exactly once across re-runs") {
    val land = tmpDir("landing")
    val t = tmpTable()
    // batch 1: two part files
    (0 until 50).map(i => (i.toLong, s"a$i")).toDF("k", "v")
      .repartition(2).write.mode("append").parquet(land)
    val r1 = TxLog.copyInto(spark, land, t)
    assert(r1.filesIngested == 2 && r1.rowsIngested == 50)
    assert(TxLog.read(spark, t).count() == 50L)
    // re-run over unchanged landing: commits NOTHING
    val r2 = TxLog.copyInto(spark, land, t)
    assert(r2.filesIngested == 0 && r2.version == r1.version)
    assert(TxLog.latestVersion(spark, t).contains(r1.version))
    // batch 2 arrives alongside batch 1: only the new file is read
    (50 until 80).map(i => (i.toLong, s"b$i")).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(land)
    val r3 = TxLog.copyInto(spark, land, t)
    assert(r3.filesIngested == 1 && r3.rowsIngested == 30)
    assert(r3.version == r1.version + 1)
    val got = TxLog.read(spark, t).as[(Long, String)].collect()
    assert(got.length == 80 && got.map(_._1).toSet == (0L until 80L).toSet)
    // the ledger is IN the manifest: every source file recorded once
    val ledger = TxLog.manifest(spark, t).txn.getOrElse(Map.empty)
      .keys.filter(_.startsWith("copyInto:"))
    assert(ledger.size == 3)
  }

  test("a mutated landing file fails loudly instead of guessing") {
    val land = tmpDir("landing-mut")
    val t = tmpTable()
    Seq((1L, "x")).toDF("k", "v").coalesce(1).write.mode("append").parquet(land)
    TxLog.copyInto(spark, land, t)
    // overwrite the same file name with different content/length
    val part = new java.io.File(land).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val tmp = tmpDir("landing-tmp")
    Seq((2L, "mutated-longer-content"), (3L, "even-longer-padding-row"))
      .toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
    val newPart = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(newPart.toPath, part.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val e = intercept[IllegalArgumentException] {
      TxLog.copyInto(spark, land, t)
    }
    assert(e.getMessage.contains("mutated"))
  }

  test("corrupt json rows quarantine when routed, fail when not") {
    val land = tmpDir("landing-json")
    val t = tmpTable()
    val q = tmpDir("quarantine")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(land, "a.json"),
      """{"k": 1, "v": "ok"}
        |not json at all
        |{"k": 2, "v": "fine"}""".stripMargin.getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    // no quarantine dir: refuse to drop data silently
    intercept[IllegalArgumentException] {
      TxLog.copyInto(spark, land, t, format = "json", schema = Some(schema))
    }
    assert(TxLog.latestVersion(spark, t).isEmpty, "nothing may land")
    // routed: valid rows land, the corrupt one is preserved in parquet
    val r = TxLog.copyInto(spark, land, t, format = "json",
      schema = Some(schema), quarantineDir = Some(q))
    assert(r.rowsIngested == 2)
    assert(TxLog.read(spark, t).count() == 2L)
    val quarantined = spark.read.parquet(q)
    assert(quarantined.count() == 1L)
    assert(quarantined.select("raw_record").as[String].head
      .contains("not json"))
    // the pre-commit staging promoted and cleaned itself: a successful
    // run leaves no attempt dirs behind under _staged/
    val staged = java.nio.file.Paths.get(q, "_staged")
    assert(!java.nio.file.Files.exists(staged) ||
      !java.nio.file.Files.list(staged).iterator().hasNext,
      "staging must promote-and-clean on the winning commit")
  }

  test("a lost CAS retry never duplicates quarantine rows") {
    val land = tmpDir("landing-race")
    val t = tmpTable()
    val q = tmpDir("quarantine-race")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(land, "a.json"),
      """{"k": 1, "v": "ok"}
        |broken row
        |{"k": 2, "v": "fine"}""".stripMargin.getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    // interpose a CONCURRENT copy of the same landing between caller
    // A's staging and its publish: A loses the ledger race, retries,
    // finds nothing fresh, and must NOT have appended quarantine rows
    // for its abandoned attempt
    TxLog.casRaceHook = () => {
      TxLog.casRaceHook = () => ()
      TxLog.copyInto(spark, land, t, format = "json",
        schema = Some(schema), quarantineDir = Some(q))
    }
    try {
      val r = TxLog.copyInto(spark, land, t, format = "json",
        schema = Some(schema), quarantineDir = Some(q))
      assert(r.filesIngested == 0, "the interposed copy landed the file")
    } finally TxLog.casRaceHook = () => ()
    assert(TxLog.read(spark, t).count() == 2L)
    // exactly ONE quarantine record for the one corrupt row — the old
    // pre-publish write would have appended it once per attempt
    assert(spark.read.parquet(q).count() == 1L)
    // the losing attempt deleted its own staging on retry
    val staged = java.nio.file.Paths.get(q, "_staged")
    assert(!java.nio.file.Files.exists(staged) ||
      !java.nio.file.Files.list(staged).iterator().hasNext,
      "a lost attempt's staging must not linger")
  }

  test("PATTERN globs the landing; FILES names exact paths; both loud") {
    val land = tmpDir("landing-pat")
    val t = tmpTable()
    def put(rel: String, rows: Seq[(Long, String)]): Unit = {
      val p = java.nio.file.Paths.get(land, rel)
      java.nio.file.Files.createDirectories(p.getParent)
      rows.toDF("k", "v").coalesce(1).write.mode("overwrite")
        .parquet(p.toString + ".d")
      // single stable name so PATTERN/FILES can address it
      val part = new java.io.File(p.toString + ".d").listFiles()
        .filter(f => f.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath, p)
      def rmr(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rmr)); f.delete(); ()
      }
      rmr(new java.io.File(p.toString + ".d"))
    }
    put("a_1.parquet", Seq((1L, "a")))
    put("a_2.parquet", Seq((2L, "b")))
    put("other/b_1.parquet", Seq((9L, "junk")))
    // PATTERN: only the root a_* files; the sub-dir feed stays out
    val r = TxLog.copyInto(spark, land, t, pattern = Some("a_*.parquet"))
    assert(r.filesIngested == 2)
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    // FILES: exactly the named landing-relative paths
    val t2 = tmpTable()
    val r2 = TxLog.copyInto(spark, land, t2,
      files = Some(Seq("a_1.parquet", "other/b_1.parquet")))
    assert(r2.filesIngested == 2)
    assert(TxLog.read(spark, t2).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (9L, "junk")))
    // a FILES entry that does not exist fails loudly
    intercept[java.io.FileNotFoundException] {
      TxLog.copyInto(spark, land, tmpTable(),
        files = Some(Seq("missing.parquet")))
    }
    // the selectors are mutually exclusive
    intercept[IllegalArgumentException] {
      TxLog.copyInto(spark, land, tmpTable(),
        pattern = Some("a_*"), files = Some(Seq("a_1.parquet")))
    }
    // the ledger keys by path: re-running the PATTERN copy is a no-op,
    // and widening to FILES on the same table ingests only the new file
    val r3 = TxLog.copyInto(spark, land, t, pattern = Some("a_*.parquet"))
    assert(r3.filesIngested == 0)
    val r4 = TxLog.copyInto(spark, land, t,
      files = Some(Seq("a_1.parquet", "other/b_1.parquet")))
    assert(r4.filesIngested == 1, "a_1 already ledgered; only b_1 lands")
  }

  test("SQL: COPY INTO with PATTERN and FILES") {
    val land = tmpDir("landing-pat-sql")
    val t = tmpTable()
    Seq((1L, "a")).toDF("k", "v").coalesce(1)
      .write.mode("append").parquet(land)
    Seq((9L, "x")).toDF("k", "v").coalesce(1)
      .write.mode("append").parquet(s"$land/skip")
    TxLog.overwrite(Seq((0L, "seed")).toDF("k", "v"), t)
    spark.sql("DROP TABLE IF EXISTS copy_pat")
    spark.sql(s"CREATE TABLE copy_pat USING `graft-txlog` OPTIONS (path '$t')")
    try {
      val row = spark.sql(
        s"COPY INTO copy_pat FROM '$land' PATTERN = 'part-*'").collect()(0)
      assert(row.getLong(1) == 1L, "only the root part file matches")
      assert(spark.sql("SELECT count(*) FROM copy_pat").collect()(0)
        .getLong(0) == 2L)
      // FILES names the skipped one explicitly
      val rel = new java.io.File(s"$land/skip").listFiles()
        .map(_.getName).filter(_.endsWith(".parquet")).head
      val row2 = spark.sql(
        s"COPY INTO copy_pat FROM '$land' FILES = ('skip/$rel')").collect()(0)
      assert(row2.getLong(1) == 1L)
      assert(spark.sql("SELECT count(*) FROM copy_pat").collect()(0)
        .getLong(0) == 3L)
    } finally spark.sql("DROP TABLE IF EXISTS copy_pat")
  }

  test("COPY_OPTIONS force re-ingests past the ledger (explicit duplicates)") {
    val land = tmpDir("landing-force")
    val t = tmpTable()
    Seq((1L, "a")).toDF("k", "v").coalesce(1)
      .write.mode("append").parquet(land)
    assert(TxLog.copyInto(spark, land, t).rowsIngested == 1)
    assert(TxLog.copyInto(spark, land, t).filesIngested == 0, "ledgered")
    val r = TxLog.copyInto(spark, land, t, force = true)
    assert(r.rowsIngested == 1, "force bypasses the ledger")
    assert(TxLog.read(spark, t).count() == 2L, "duplicates by declaration")
    // SQL spelling
    spark.sql("DROP TABLE IF EXISTS copy_force")
    spark.sql(s"CREATE TABLE copy_force USING `graft-txlog` OPTIONS (path '$t')")
    try {
      val row = spark.sql(s"COPY INTO copy_force FROM '$land' " +
        "COPY_OPTIONS ('force' = 'true')").collect()(0)
      assert(row.getLong(2) == 1L)
      assert(spark.sql("SELECT count(*) FROM copy_force")
        .collect()(0).getLong(0) == 3L)
      intercept[Exception] {
        spark.sql(s"COPY INTO copy_force FROM '$land' " +
          "COPY_OPTIONS ('bogus' = 'x')").collect()
      }
    } finally spark.sql("DROP TABLE IF EXISTS copy_force")
  }

  test("csv format options: headerless landings via header=false") {
    val land = tmpDir("landing-csv")
    val t = tmpTable()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(land, "a.csv"),
      "1,alpha\n2,beta\n3,gamma\n".getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    val r = TxLog.copyInto(spark, land, t, format = "csv",
      schema = Some(schema), options = Map("header" -> "false"))
    // with the header=true default the first DATA row would be eaten
    assert(r.rowsIngested == 3)
    assert(TxLog.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    // the SQL spelling of the same knob: FORMAT_OPTIONS
    val t2 = tmpTable()
    TxLog.overwrite(Seq((0L, "seed")).toDF("k", "v"), t2)
    spark.sql("DROP TABLE IF EXISTS copy_fmtopts")
    spark.sql(
      s"CREATE TABLE copy_fmtopts USING `graft-txlog` OPTIONS (path '$t2')")
    try {
      val row = spark.sql(
        s"COPY INTO copy_fmtopts FROM '$land' FILEFORMAT = CSV " +
          "FORMAT_OPTIONS ('header' = 'false')").collect()(0)
      assert(row.getLong(2) == 3L, "all three headerless rows ingest")
      assert(spark.sql("SELECT count(*) FROM copy_fmtopts")
        .collect()(0).getLong(0) == 4L)
    } finally spark.sql("DROP TABLE IF EXISTS copy_fmtopts")
  }

  test("SQL COPY INTO csv/json reads with the target table's schema") {
    val t = tmpTable()
    Seq((1L, "seed")).toDF("k", "v").write.format("graft-txlog").save(t)
    spark.sql(s"CREATE TABLE copy_sql_csv USING `graft-txlog` " +
      s"OPTIONS (path '$t')")
    try {
      val land = tmpDir("landing-sqlcsv")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(land, "a.csv"),
        "k,v\n2,two\n3,three\n".getBytes("UTF-8"))
      val res = spark.sql(
        s"COPY INTO copy_sql_csv FROM '$land' FILEFORMAT = CSV").collect()
      assert(res.head.getLong(1) == 1L) // files_ingested
      assert(res.head.getLong(2) == 2L) // rows_ingested
      assert(spark.table("copy_sql_csv").count() == 3L)
      // idempotent re-run through SQL too
      val res2 = spark.sql(
        s"COPY INTO copy_sql_csv FROM '$land' FILEFORMAT = CSV").collect()
      assert(res2.head.getLong(1) == 0L)
    } finally spark.sql("DROP TABLE IF EXISTS copy_sql_csv")
  }

  test("constraints and schema drift guard the copy like any append") {
    val land = tmpDir("landing-cons")
    val t = tmpTable()
    Seq((1L, "a")).toDF("k", "v").coalesce(1).write.mode("append").parquet(land)
    TxLog.copyInto(spark, land, t)
    TxLog.addConstraint(spark, t, "k_pos", "k > 0")
    // a violating landing file fails before anything commits
    Seq((-5L, "bad")).toDF("k", "v").coalesce(1)
      .write.mode("append").parquet(land)
    val before = TxLog.latestVersion(spark, t).get
    intercept[Exception] { TxLog.copyInto(spark, land, t) }
    assert(TxLog.latestVersion(spark, t).contains(before))
    assert(TxLog.read(spark, t).count() == 1L)
  }
}
