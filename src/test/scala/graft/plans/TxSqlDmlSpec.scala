package graft.plans

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.sources.TxLog

/** SQL DELETE/UPDATE/MERGE on graft-txlog catalog tables (q124): the
  * planner strategy routes Spark's own analyzed DML plans into the
  * transactional layer — same semantics as the Scala API, reached from
  * pure SQL text.
  */
class TxSqlDmlSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshTable(): (String, String) = synchronized {
    n += 1
    val name = s"sqldml_$n"
    val path = java.nio.file.Files.createTempDirectory("graft-sqldml")
      .resolve("t").toString
    (name, path)
  }

  private def mk(): (String, String) = {
    val (name, path) = freshTable()
    TxLog.overwrite(Seq(
      (1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, "d", 40)
    ).toDF("k", "v", "n").repartition(2, col("k")), path)
    spark.sql(s"CREATE TABLE $name USING `graft-txlog` OPTIONS (path '$path')")
    (name, path)
  }

  test("SQL DELETE commits through the log and the table re-resolves") {
    val (name, path) = mk()
    assert(spark.sql(s"SELECT * FROM $name").count() == 4L) // pin a snapshot
    spark.sql(s"DELETE FROM $name WHERE n >= 30")
    assert(spark.sql(s"SELECT * FROM $name").count() == 2L)
    assert(TxLog.read(spark, path).count() == 2L) // the Scala view agrees
    assert(TxLog.manifest(spark, path).action == "delete")
  }

  test("SQL UPDATE applies assignments with SQL WHERE semantics") {
    val (name, path) = mk()
    spark.sql(s"UPDATE $name SET v = concat(v, '!'), n = n + 1 WHERE k <= 2")
    val got = TxLog.read(spark, path).as[(Long, String, Int)].collect().toSet
    assert(got == Set((1L, "a!", 11), (2L, "b!", 21), (3L, "c", 30), (4L, "d", 40)))
  }

  test("SQL MERGE: conditional matched clauses, insert, by-source") {
    val (name, path) = mk()
    Seq((2L, "B", "upd"), (3L, "C", "del"), (9L, "I", "ins"))
      .toDF("k", "sv", "op").createOrReplaceTempView("chg")
    spark.sql(
      s"""MERGE INTO $name t USING chg s ON t.k = s.k
         |WHEN MATCHED AND s.op = 'del' THEN DELETE
         |WHEN MATCHED AND s.op = 'upd' THEN UPDATE SET v = s.sv, n = t.n + 1
         |WHEN NOT MATCHED AND s.op = 'ins' THEN INSERT (k, v) VALUES (s.k, s.sv)
         |WHEN NOT MATCHED BY SOURCE AND t.k = 4 THEN UPDATE SET v = 'stale'
         |""".stripMargin)
    val got = TxLog.read(spark, path).as[(Long, String, Option[Int])]
      .collect().toSet
    assert(got == Set(
      (1L, "a", Some(10)), (2L, "B", Some(21)), (4L, "stale", Some(40)),
      (9L, "I", None)))
  }

  test("the deletion-vector table property routes SQL DML through DVs") {
    val (name, path) = mk()
    TxLog.setProperty(spark, path, TxLog.dvPropertyKey, "true")
    val before = TxLog.manifest(spark, path).files.toSet
    spark.sql(s"DELETE FROM $name WHERE k = 1")
    val m = TxLog.manifest(spark, path)
    assert(m.files.toSet == before, "DV-routed SQL DELETE rewrote a file")
    assert(m.dvs.exists(_.map(_.deleted).sum == 1L))
    assert(spark.sql(s"SELECT * FROM $name").count() == 3L)
    // property survives commits and restore semantics like other metadata
    assert(TxLog.dmlDeletionVectors(spark, path))
    TxLog.unsetProperty(spark, path, TxLog.dvPropertyKey)
    assert(!TxLog.dmlDeletionVectors(spark, path))
  }

  test("the changeFeed table property makes SQL DML record CDF") {
    val (name, path) = mk()
    TxLog.setProperty(spark, path, TxLog.cfPropertyKey, "true")
    val since = TxLog.latestVersion(spark, path).get
    spark.sql(s"DELETE FROM $name WHERE k = 1")
    spark.sql(s"UPDATE $name SET n = n + 100 WHERE k = 2")
    val cdf = TxLog.readChangeFeed(spark, path, sinceVersion = since)
      .select("k", "n", "_change_type").as[(Long, Int, String)]
      .collect().toSet
    assert(cdf == Set(
      (1L, 10, "delete"),
      (2L, 20, "update_preimage"),
      (2L, 120, "update_postimage")))
  }

  test("ALTER TABLE SET/UNSET TBLPROPERTIES commits to the manifest") {
    val (name, path) = mk()
    spark.sql(s"ALTER TABLE $name SET TBLPROPERTIES " +
      s"('${TxLog.dvPropertyKey}' = 'true', 'graft.team' = 'pipeline')")
    assert(TxLog.propertiesOf(spark, path) ==
      Map(TxLog.dvPropertyKey -> "true", "graft.team" -> "pipeline"))
    assert(TxLog.dmlDeletionVectors(spark, path))
    // ... and the property immediately routes SQL DML through DVs
    val before = TxLog.manifest(spark, path).files.toSet
    spark.sql(s"DELETE FROM $name WHERE k = 1")
    assert(TxLog.manifest(spark, path).files.toSet == before)
    spark.sql(s"ALTER TABLE $name UNSET TBLPROPERTIES ('graft.team')")
    assert(TxLog.propertiesOf(spark, path).keySet ==
      Set(TxLog.dvPropertyKey))
    // property history is transactional like everything else
    assert(TxLog.manifest(spark, path).action == "unset_property")
  }

  test("SHOW TBLPROPERTIES answers from the manifest, not the metastore") {
    val (name, path) = mk()
    spark.sql(s"ALTER TABLE $name SET TBLPROPERTIES " +
      "('graft.team' = 'pipeline', 'graft.tier' = 'gold')")
    // the SET bypassed the metastore; SHOW must still see both keys
    val all = spark.sql(s"SHOW TBLPROPERTIES $name")
      .as[(String, String)].collect().toSet
    assert(all == Set("graft.team" -> "pipeline", "graft.tier" -> "gold"))
    // single-key lookup form (Spark 4.1 keeps the (key, value) arity)
    assert(spark.sql(s"SHOW TBLPROPERTIES $name ('graft.tier')")
      .as[(String, String)].collect().toSeq == Seq("graft.tier" -> "gold"))
    // a missing key reports the command's message, not a stale value
    val miss = spark.sql(s"SHOW TBLPROPERTIES $name ('graft.nope')")
      .as[(String, String)].collect().head._2
    assert(miss.contains("does not have property"))
    // UNSET is visible immediately through the same surface
    spark.sql(s"ALTER TABLE $name UNSET TBLPROPERTIES ('graft.team')")
    assert(spark.sql(s"SHOW TBLPROPERTIES $name")
      .as[(String, String)].collect().toSet == Set("graft.tier" -> "gold"))
  }

  test("graft_tx_properties exposes TBLPROPERTIES to SQL") {
    val (_, path) = mk()
    TxLog.setProperty(spark, path, TxLog.dvPropertyKey, "true")
    TxLog.setProperty(spark, path, "owner", "pipeline")
    val got = spark.sql(s"SELECT * FROM graft_tx_properties('$path')")
      .as[(String, String)].collect().toSet
    assert(got == Set(TxLog.dvPropertyKey -> "true", "owner" -> "pipeline"))
    TxLog.unsetProperty(spark, path, "owner")
    assert(spark.sql(s"SELECT * FROM graft_tx_properties('$path')")
      .count() == 1L)
  }

  test("DML through a time-travel relation is rejected") {
    val (name, path) = mk()
    val (tvName, _) = freshTable()
    spark.sql(s"CREATE TABLE $tvName USING `graft-txlog` " +
      s"OPTIONS (path '$path', versionAsOf '1')")
    val e = intercept[Exception] { spark.sql(s"DELETE FROM $tvName WHERE k = 1") }
    assert(e.getMessage.contains("time-travel"))
  }

  test("uncorrelated subquery predicates materialize: IN, NOT IN, scalar, EXISTS") {
    val (name, path) = mk()
    Seq(1L, 2L).toDF("k").createOrReplaceTempView("doomed")
    spark.sql(s"DELETE FROM $name WHERE k IN (SELECT k FROM doomed)")
    assert(TxLog.read(spark, path).select("k").as[Long].collect().toSet ==
      Set(3L, 4L), "IN (SELECT …) deleted exactly the subquery's keys")
    // scalar subquery in an UPDATE assignment and predicate
    spark.sql(s"UPDATE $name SET n = (SELECT max(k) FROM doomed) * 100 " +
      s"WHERE k > (SELECT min(k) FROM doomed)")
    assert(TxLog.read(spark, path).select("n").as[Int].collect().toSet ==
      Set(200), "scalar subqueries evaluated in SET and WHERE")
    // EXISTS (uncorrelated): true → everything matches the rest of WHERE
    spark.sql(s"DELETE FROM $name WHERE EXISTS (SELECT 1 FROM doomed) AND k = 3")
    assert(TxLog.read(spark, path).select("k").as[Long].collect().toSet == Set(4L))
    // NOT IN over an empty subquery: standard SQL keeps-everything
    spark.sql(s"DELETE FROM $name WHERE k NOT IN (SELECT k FROM doomed WHERE k < 0)")
    assert(TxLog.read(spark, path).count() == 0L,
      "NOT IN (empty) is true for every row")
  }

  test("a correlated subquery predicate still fails loudly") {
    val (name, path) = mk()
    val (other, opath) = freshTable()
    TxLog.overwrite(Seq((1L, 5)).toDF("k", "lim"), opath)
    spark.sql(s"CREATE TABLE $other USING `graft-txlog` OPTIONS (path '$opath')")
    val e = intercept[Exception] {
      spark.sql(s"DELETE FROM $name WHERE n > " +
        s"(SELECT max(lim) FROM $other WHERE $other.k = $name.k)")
    }
    assert(e.getMessage.contains("correlated"))
    assert(TxLog.read(spark, path).count() == 4L)
  }

  test("MERGE WITH SCHEMA EVOLUTION widens the table and the catalog sees it") {
    val (name, path) = mk() // (k, v, n)
    Seq((2L, "B2", 200, "zz"), (8L, "H", 800, "hh"))
      .toDF("k", "v", "n", "extra")
      .createOrReplaceTempView(s"${name}_evo")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $name t USING ${name}_evo s
         |ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // the catalog relation agrees with the evolved manifest schema
    val got = spark.sql(s"SELECT k, v, n, extra FROM $name ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(3))))
    assert(got.toSeq == Seq(
      (1L, "a", None), (2L, "B2", Some("zz")), (3L, "c", None),
      (4L, "d", None), (8L, "H", Some("hh"))))
    assert(TxLog.read(spark, path).columns.toSeq == Seq("k", "v", "n", "extra"))
  }

  test("WITH SCHEMA EVOLUTION leaves EXPLICIT partial clauses alone") {
    // Delta's contract (README): only star clauses evolve. An explicit
    // `UPDATE SET v = s.v` must neither write s.extra into updated rows
    // nor widen the table with a column no clause referenced.
    val (name, path) = mk() // (k, v, n)
    Seq((2L, "B2", 200, "zz"), (8L, "H", 800, "hh"))
      .toDF("k", "v", "n", "extra")
      .createOrReplaceTempView(s"${name}_pev")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $name t USING ${name}_pev s
         |ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    assert(TxLog.read(spark, path).columns.toSeq == Seq("k", "v", "n"),
      "explicit partial UPDATE must not evolve the schema")
    val got = TxLog.read(spark, path).as[(Long, String, Int)].collect().toSet
    assert(got == Set((1L, "a", 10), (2L, "B2", 20), (3L, "c", 30),
      (4L, "d", 40)))
    // a star INSERT alongside the explicit UPDATE: the star still
    // evolves, the explicit clause's updated rows take NULL there
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $name t USING ${name}_pev s
         |ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET n = s.n
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(TxLog.read(spark, path).columns.toSeq == Seq("k", "v", "n", "extra"))
    val after = spark.sql(s"SELECT k, n, extra FROM $name ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1), Option(r.get(2))))
    assert(after.toSeq == Seq((1L, 10, None), (2L, 200, None),
      (3L, 30, None), (4L, 40, None), (8L, 800, Some("hh"))),
      "updated row 2 must NOT receive s.extra; inserted row 8 must")
  }

  test("SQL MERGE with UPDATE SET * / INSERT *") {
    val (name, path) = mk()
    Seq((2L, "B2", 200), (8L, "H", 800)).toDF("k", "v", "n")
      .createOrReplaceTempView("star_src")
    spark.sql(
      s"""MERGE INTO $name t USING star_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |""".stripMargin)
    val got = TxLog.read(spark, path).as[(Long, String, Int)].collect().toSet
    assert(got == Set((1L, "a", 10), (2L, "B2", 200), (3L, "c", 30),
      (4L, "d", 40), (8L, "H", 800)))
  }
}
