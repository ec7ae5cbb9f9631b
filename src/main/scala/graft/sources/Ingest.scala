package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Ingestion surface: schema-enforced reads of json/csv/parquet plus
  * partitioned parquet writes.
  *
  * Re-expresses the reference's extract/load layer
  * (`/root/reference/scripts/spark_jobs/data_cleaning.py:30-68` reads API
  * JSON dumps; `:100-118` writes parquet partitioned by year/month, the
  * layout its Hive external tables mount).
  *
  * Scale notes: every reader takes an explicit schema — schema inference
  * is a full extra pass over the source at 100 TB and non-deterministic
  * under drift. Corrupt rows are quarantined via PERMISSIVE +
  * `_corrupt_record` (a routable side-channel, not a job failure).
  * Partitioned writes target (year, month) — low-cardinality directory
  * partitioning that prunes time-range scans without creating a
  * small-file explosion per key.
  */
object Ingest {

  val corruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(corruptCol)) schema
    else schema.add(StructField(corruptCol, org.apache.spark.sql.types.StringType))

  /** The quarantine-ready schema ([[corruptCol]] appended) — for
    * callers composing their own PERMISSIVE reads ([[TxLog.copyInto]]).
    */
  private[sources] def corruptible(schema: StructType): StructType =
    withCorrupt(schema)

  /** Schema-enforced JSON-lines read; malformed rows land in
    * `_corrupt_record` instead of failing the job.
    */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

  /** Schema-enforced CSV read with header, same quarantine contract. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path)

  /** Split a quarantined read into (valid, corrupt) frames. */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    // PERMISSIVE json requires caching before filtering on the corrupt
    // column (Spark refuses the raw-record-only query otherwise).
    val cached = graft.CacheRegistry.track(df.cache())
    (cached.filter(col(corruptCol).isNull).drop(corruptCol),
      cached.filter(col(corruptCol).isNotNull))
  }

  /** Recursively flatten struct columns to top-level `parent_child`
    * columns (the reference's nested-API-payload flattening,
    * data_cleaning.py:41-58). Arrays are left intact — explode is a
    * row-multiplying decision the caller makes explicitly.
    */
  def flatten(df: DataFrame): DataFrame = {
    def cols(schema: StructType, prefix: String): Seq[(String, org.apache.spark.sql.Column)] =
      schema.fields.flatMap { f =>
        val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        val name = path.replace(".", "_")
        f.dataType match {
          case s: StructType => cols(s, path)
          case _ => Seq(name -> col(path).as(name))
        }
      }
    val out = cols(df.schema, "")
    val names = out.map(_._1)
    require(names.distinct.size == names.size,
      "flatten would produce duplicate column names: " +
        names.diff(names.distinct).distinct.mkString(", "))
    df.select(out.map(_._2): _*)
  }

  /** Explode an array-of-structs column into one row per element with the
    * element's fields flattened to `alias_field` columns (the reference's
    * SEC-filings unnesting, data_cleaning.py:215-258: one row per filing
    * from a per-company filings array).
    */
  def explodeStructArray(df: DataFrame, arrayCol: String, alias: String): DataFrame = {
    val exploded = df.withColumn(alias, explode(col(arrayCol))).drop(arrayCol)
    val elemFields = exploded.schema(alias).dataType.asInstanceOf[StructType].fieldNames
    val keep = exploded.columns.filterNot(_ == alias).map(col)
    exploded.select(keep ++ elemFields.map(f => col(s"$alias.$f").as(s"${alias}_$f")): _*)
  }

  /** Partitioned columnar write: directory layout `col1=v/col2=v/...`,
    * prunable by any engine mounting the path (Hive/Trino/DuckDB/Spark).
    * `format` is any columnar source Spark ships ("parquet" default,
    * "orc" for ORC-native lakes); Delta would slot in the same way but
    * its jars don't ship in this offline environment (see SURVEY §8).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: String = "overwrite", format: String = "parquet"): Unit =
    df.write.mode(mode).format(format).partitionBy(partitionCols: _*).save(path)

  /** Schema-enforced ORC read — the second columnar lake format next to
    * parquet; same pruning/pushdown contract (`PushedFilters` in the
    * scan), no corrupt-record channel (ORC is self-describing binary —
    * unreadable stripes fail loudly rather than quarantining).
    */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Year/month-partitioned write of a timestamped frame — the
    * reference's standard lake layout (derives the partition columns,
    * then writes).
    */
  def writeByMonth(df: DataFrame, tsCol: String, path: String): Unit =
    writePartitioned(
      df.withColumn("year", year(col(tsCol))).withColumn("month", month(col(tsCol))),
      path, Seq("year", "month"))

  /** Serving-layer targets — the reference loads its mart tables into
    * PostgreSQL for dashboards (`/root/reference/sql/postgresql_schemas
    * .sql`, DAG load step); [[FileTarget]] is the lake-side equivalent
    * for engines that mount files directly.
    */
  sealed trait ServingTarget

  /** JDBC mart table. `maxConnections` bounds write parallelism: each
    * writing partition opens one connection, so an unbounded fan-in from
    * a 1000-executor job would exhaust the database's connection pool —
    * the writer coalesces to this many partitions. `batchSize` rows ride
    * per INSERT batch.
    */
  final case class JdbcTarget(url: String, table: String,
      user: String, password: String,
      batchSize: Int = 10000, maxConnections: Int = 8) extends ServingTarget

  /** Columnar file mart (parquet/orc/csv/json — any shipped source).
    * NOTE: overwrite here is delete-then-write — a reader racing the
    * rewrite can see a partial table. Use [[TxTarget]] for publishes
    * that concurrent readers may observe.
    */
  final case class FileTarget(path: String, format: String = "parquet")
      extends ServingTarget

  /** Transactional parquet mart via [[TxLog]]: atomic snapshot publish,
    * snapshot-isolated readers, time travel. The right target for the
    * nightly serving-layer rewrite a dashboard reads concurrently.
    */
  final case class TxTarget(path: String) extends ServingTarget

  /** Writer options for a [[JdbcTarget]] — pure and unit-tested (no
    * database ships in this offline environment, so the JDBC save itself
    * cannot be exercised here; the FileTarget path is). `truncate=true`
    * makes overwrite TRUNCATE the serving table instead of dropping it,
    * preserving the DDL-managed schema, indexes and grants the reference
    * defines in postgresql_schemas.sql.
    */
  private[sources] def jdbcOptions(t: JdbcTarget): Map[String, String] = Map(
    "url" -> t.url,
    "dbtable" -> t.table,
    "user" -> t.user,
    "password" -> t.password,
    "batchsize" -> t.batchSize.toString,
    "numPartitions" -> t.maxConnections.toString,
    "truncate" -> "true")

  /** Load a result frame into the serving layer. One entry point, target
    * chosen by descriptor — the lakehouse "load" step behind which the
    * actual mart technology can change without touching query code.
    */
  def writeServing(df: DataFrame, target: ServingTarget,
                   mode: String = "overwrite"): Unit = target match {
    case t: JdbcTarget =>
      df.write.mode(mode).format("jdbc").options(jdbcOptions(t)).save()
    case FileTarget(path, fmt) =>
      df.write.mode(mode).format(fmt).save(path)
    case TxTarget(path) => mode match {
      case "overwrite" => TxLog.overwrite(df, path)
      case "append" => TxLog.append(df, path)
      case other => sys.error(
        s"TxTarget supports overwrite/append, not '$other'")
    }
  }
}
