package graft.sources

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s.NoTypeHints
import org.json4s.jackson.Serialization

/** Transactional table layer over plain parquet — the manifest/commit-log
  * pattern of Delta Lake / Iceberg re-expressed without their jars (none
  * ship in this offline environment; the BASELINE north star names
  * "Delta/Parquet" as the storage layer, and the reference's nightly
  * publish (`/root/reference/scripts/spark_jobs/data_transformation.py`
  * overwrite writes) is exactly the job class that needs it).
  *
  * Layout:
  * {{{
  *   table/
  *     _txlog/00000000000000000001.json   // one manifest per version
  *     data/<commit-uuid>/part-*.parquet  // immutable data files
  * }}}
  *
  * Protocol (the public HDFS log-store recipe):
  *  1. Write the new data files under a fresh `data/<uuid>/` directory.
  *     Readers never list directories — only manifest-referenced files
  *     are visible, so uncommitted data is invisible by construction.
  *  2. Compose a manifest (file list + schema) for the next version and
  *     publish it with an ATOMIC RENAME into `_txlog/` that fails if the
  *     version already exists (`FileContext.rename(…, Rename.NONE)`,
  *     rename-if-absent — HDFS-atomic, the same primitive Delta's
  *     HDFSLogStore uses). A losing concurrent committer retries against
  *     the new latest version; a crash before the rename leaves only an
  *     orphaned data directory, never a torn table.
  *
  * Guarantees:
  *  - '''Atomic publish''': a reader sees version N fully or not at all —
  *    there is no moment where a directory listing mixes old and new
  *    files, because readers resolve the manifest first.
  *  - '''Snapshot isolation''': data files are immutable and overwrite
  *    only ADDS a manifest; a DataFrame resolved against version N keeps
  *    returning version N's rows even while N+1 is being committed.
  *  - '''Time travel''': every manifest is retained until [[vacuum]], so
  *    `readAsOf(version)` reconstructs any historical snapshot.
  *
  * Scale notes: the manifest holds relative file paths + the schema JSON —
  * a few KB per thousand files; commit cost is one small-file write + one
  * metadata rename, independent of table size. Reads plan from the
  * explicit file list (no directory listing — at 100 TB an object-store
  * LIST of a million files is the slow path the manifest exists to skip)
  * with the stored schema (no footer-sampling inference pass).
  */
object TxLog {

  /** One committed version. `files` are table-root-relative. */
  final case class Manifest(version: Long, action: String,
      files: Seq[String], schemaJson: String, tsMillis: Long)

  private implicit val jsonFormats: org.json4s.Formats =
    Serialization.formats(NoTypeHints)

  /** Spark parquet scans force every field nullable regardless of the
    * supplied schema; store the schema in that normalized form so the
    * manifest states what a read actually returns. Column metadata is
    * stripped too — it doesn't affect what a read returns, and keeping
    * it would make the append drift check reject semantically identical
    * frames over metadata bytes (e.g. ML attribute annotations).
    */
  private def asNullable(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = asNullable(f.dataType), nullable = true,
        metadata = org.apache.spark.sql.types.Metadata.empty)))
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = asNullable(a.elementType), containsNull = true)
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(valueType = asNullable(m.valueType), valueContainsNull = true)
    case other => other
  }

  private val manifestName = raw"(\d{20})\.json".r
  private def logDir(table: Path) = new Path(table, "_txlog")
  private def manifestPath(table: Path, version: Long) =
    new Path(logDir(table), f"$version%020d.json")

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** All committed versions, ascending. Ignores foreign/temp files in the
    * log dir (an in-flight `.tmp-*` manifest is not a version).
    */
  def versions(spark: SparkSession, table: String): Seq[Long] = {
    val dir = logDir(new Path(table))
    val f = fs(spark, dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.flatMap(_.getPath.getName match {
      case manifestName(v) => Some(v.toLong)
      case _ => None
    }).sorted
  }

  def latestVersion(spark: SparkSession, table: String): Option[Long] =
    versions(spark, table).lastOption

  private def readManifest(spark: SparkSession, table: Path, version: Long): Manifest = {
    val p = manifestPath(table, version)
    val f = fs(spark, p)
    require(f.exists(p), s"table $table has no version $version " +
      "(never committed, or vacuumed away)")
    val in = f.open(p)
    try Serialization.read[Manifest](
      new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8"))
    finally in.close()
  }

  private def toDf(spark: SparkSession, table: Path, m: Manifest): DataFrame = {
    val schema = DataType.fromJson(m.schemaJson).asInstanceOf[StructType]
    if (m.files.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema)
      .parquet(m.files.map(new Path(table, _).toString): _*)
  }

  /** Latest committed snapshot. Planning reads ONLY the manifest-listed
    * files with the stored schema — no directory listing, no inference.
    */
  def read(spark: SparkSession, table: String): DataFrame = {
    val latest = latestVersion(spark, table).getOrElse(
      sys.error(s"table $table has no committed versions"))
    readAsOf(spark, table, latest)
  }

  /** Time travel: the table exactly as committed at `version`. */
  def readAsOf(spark: SparkSession, table: String, version: Long): DataFrame = {
    val t = new Path(table)
    toDf(spark, t, readManifest(spark, t, version))
  }

  /** Replace the table contents atomically. Returns the new version. */
  def overwrite(df: DataFrame, table: String): Long =
    commit(df, table, "overwrite", (_, fresh) => fresh)

  /** Add rows atomically; prior files stay referenced. The appended
    * frame must match the table's schema (names + types, nullability
    * normalized): the manifest records ONE schema for the whole file
    * list, so a drifted append would make readers silently null-fill or
    * misread the older files.
    */
  def append(df: DataFrame, table: String): Long =
    commit(df, table, "append", (parent, fresh) => parent ++ fresh)

  /** Write data files, then publish the manifest via rename-if-absent.
    * Optimistic concurrency: a lost race re-reads the (new) parent
    * snapshot and retries with the SAME already-written data files —
    * only the metadata attempt repeats, never the data write.
    */
  private def commit(df: DataFrame, table: String, action: String,
      newFiles: (Seq[String], Seq[String]) => Seq[String]): Long = {
    val spark = df.sparkSession
    val f = fs(spark, new Path(table))
    // qualified (scheme-carrying) path: FileContext resolves its
    // AbstractFileSystem from the URI scheme
    val t = f.makeQualified(new Path(table))
    val commitId = java.util.UUID.randomUUID().toString
    val dataRel = s"data/$commitId"
    val dataDir = new Path(t, dataRel)
    df.write.parquet(dataDir.toString)
    val fresh = f.listStatus(dataDir).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).sorted.map(n => s"$dataRel/$n")
    f.mkdirs(logDir(t))
    val fc = FileContext.getFileContext(t.toUri, spark.sessionState.newHadoopConf())
    val schemaJson = asNullable(df.schema).json
    // did OUR rename land at `version`? Identified by this commit's
    // unique data directory appearing in the published manifest — the
    // lost-ack disambiguator (a rename can succeed server-side while the
    // client sees an IOException; blindly retrying such a commit would
    // re-list `fresh` on top of a parent that already contains it and
    // double-count every appended row).
    def winner(version: Long): Boolean = {
      val p = manifestPath(t, version)
      f.exists(p) && readManifest(spark, t, version).files
        .exists(_.startsWith(dataRel + "/"))
    }
    var attempt = 0
    while (true) {
      attempt += 1
      val parent = latestVersion(spark, table).map(readManifest(spark, t, _))
      // a lost-ack success would appear here as our own data dir in the
      // parent — the commit is already published, return it
      parent.filter(_.files.exists(_.startsWith(dataRel + "/")))
        .foreach(p => return p.version)
      val parentFiles = parent.map(_.files).getOrElse(Seq.empty)
      if (action == "append") parent.foreach { p =>
        require(p.schemaJson == schemaJson,
          s"append schema mismatch for $table: table has ${p.schemaJson}, " +
            s"frame has $schemaJson — overwrite to change schema")
      }
      val version = parent.map(_.version).getOrElse(0L) + 1
      val m = Manifest(version, action, newFiles(parentFiles, fresh),
        schemaJson, System.currentTimeMillis())
      val tmp = new Path(logDir(t), s".tmp-$commitId-$attempt.json")
      val out = f.create(tmp, true)
      try out.write(Serialization.write(m).getBytes("UTF-8")) finally out.close()
      try {
        // rename-if-absent: the ONE atomic, mutual-exclusion step
        fc.rename(tmp, manifestPath(t, version), Options.Rename.NONE)
        return version
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException
             | _: java.nio.file.FileAlreadyExistsException if attempt < 20 =>
          f.delete(tmp, false) // definitely lost the race; retry
        case _: java.io.IOException if attempt < 20 =>
          f.delete(tmp, false)
          // ambiguous failure: the rename may have landed (lost ack) —
          // if the target now exists with OUR data dir, we won
          if (winner(version)) return version
          // else: someone else owns `version` (or nothing landed); retry
      }
    }
    sys.error("unreachable")
  }

  /** Drop all but the last `keepVersions` manifests and delete the data
    * files ONLY they referenced. Files referenced by any kept version
    * survive; unknown files (possibly an in-flight commit's) are never
    * touched. Returns the deleted data-file paths (table-relative).
    */
  def vacuum(spark: SparkSession, table: String, keepVersions: Int): Seq[String] = {
    require(keepVersions >= 1, "must keep at least the latest version")
    val t = new Path(table)
    val f = fs(spark, t)
    val all = versions(spark, table)
    val (drop, keep) = all.splitAt((all.size - keepVersions).max(0))
    val keptFiles = keep.flatMap(v => readManifest(spark, t, v).files).toSet
    val doomed = drop.flatMap(v => readManifest(spark, t, v).files)
      .distinct.filterNot(keptFiles)
    doomed.foreach(rel => f.delete(new Path(t, rel), false))
    drop.foreach(v => f.delete(manifestPath(t, v), false))
    doomed
  }
}
