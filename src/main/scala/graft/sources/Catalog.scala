package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Named-table catalog surface: lets pure-SQL users query the lakehouse
  * tables by name instead of going through the typed [[Tables]] loaders —
  * the graft counterpart of the reference's external-table DDL
  * (reference: sql/hive_schemas.sql:17-75, `CREATE EXTERNAL TABLE ...
  * STORED AS PARQUET LOCATION ...` + the views layered on top).
  *
  * Two registration modes:
  *  - [[registerViews]]: session-scoped temp views over the typed
  *    loaders. Covers every table including `events` (whose
  *    TIMESTAMP(NANOS) storage needs the loader's nanos→micros
  *    conversion — a bare external table over that file would fail to
  *    scan). Views are lazy plans: filters and column pruning written in
  *    SQL against them still reach the parquet scan.
  *  - [[registerExternalTables]]: persistent catalog entries
  *    (`CREATE TABLE ... USING parquet LOCATION`) in a named database —
  *    the metastore-backed mirror of the reference DDL, visible to any
  *    session sharing the catalog. `events` is excluded (see above) and
  *    should be exposed via [[registerViews]] on each session.
  */
object Catalog {

  private def frameFor(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      // loaders with read-path logic the raw file can't express
      case "events" => Tables.events(spark, dir)
      case "documents" => Tables.documents(spark, dir)
      case "embeddings" => Tables.embeddings(spark, dir)
      case other => Tables.load(spark, dir, other)
    }

  /** Register every testdata table as a same-named temp view on `spark`.
    * Idempotent (createOrReplace); safe to call per query.
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    Tables.names.foreach { n =>
      frameFor(spark, dir, n).createOrReplaceTempView(n)
    }

  /** Register the parquet locations as persistent unmanaged tables in
    * database `db` (created if absent). Mirrors the reference's external
    * tables: dropping them never touches the data files.
    */
  def registerExternalTables(spark: SparkSession, dir: String,
                             db: String = "graft_lakehouse"): Unit = {
    require(db.matches("[A-Za-z_][A-Za-z0-9_]*"), s"invalid database name: $db")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    Tables.names.filterNot(_ == "events").foreach { n =>
      spark.sql(
        s"CREATE TABLE IF NOT EXISTS $db.$n USING parquet LOCATION '$dir/$n.parquet'")
    }
  }
}
