package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{Command, LeafNode, LogicalPlan}
import org.apache.spark.sql.execution.LeafExecNode
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.TxLog

/** SQL spellings for the table MAINTENANCE and schema-DDL surface —
  * the statements a Delta-accustomed SQL-only user expects but Spark's
  * grammar has no production for:
  *
  * {{{
  *   OPTIMIZE t                               -- compact small files
  *   OPTIMIZE t ZORDER  BY (a, b, …)          -- Morton re-clustering
  *   OPTIMIZE t HILBERT BY (a, b, …)          -- Hilbert re-clustering
  *   VACUUM t RETAIN n VERSIONS [DRY RUN] / RETAIN n HOURS
  *   RESTORE [TABLE] t TO VERSION AS OF v / TO TIMESTAMP AS OF 'ts'
  *   OPTIMIZE t WHERE p = v                   -- partition-scoped compact
  *   OPTIMIZE t WHERE p = v ZORDER BY (a, b)  -- partition-scoped recluster
  *   DESCRIBE HISTORY t        / DESC HISTORY t
  *   DESCRIBE DETAIL t         / DESC DETAIL t
  *   ALTER TABLE t DROP COLUMN c              -- v1 analyzer would reject
  *   ALTER TABLE t RENAME COLUMN a TO b       -- v1 analyzer would reject
  *   CONVERT TO GRAFT '/path' [NO STATISTICS] -- adopt parquet in place
  *   COPY INTO t FROM '/landing' [FILEFORMAT = …] [PATTERN = 'glob']
  *     [FILES = (…)] [FORMAT_OPTIONS ('k' = 'v')] [COPY_OPTIONS ('force' = 'true')]
  *   REORG TABLE t APPLY (PURGE)              -- materialize DVs only
  *   GENERATE symlink_format_manifest FOR TABLE t -- external-reader manifests
  *   CREATE TABLE dst [SHALLOW|DEEP] CLONE src
  *     [VERSION AS OF v | TIMESTAMP AS OF 'ts']
  *   ALTER TABLE t ADD CONSTRAINT n CHECK (e) / DROP CONSTRAINT n
  *   ALTER TABLE t CLUSTER BY (a, b) / CLUSTER BY NONE
  *   ALTER TABLE t ALTER COLUMN c TYPE dt     -- metadata-only widening
  *   ALTER TABLE t ALTER COLUMN c SET DEFAULT e / DROP DEFAULT
  * }}}
  *
  * Mechanism: [[GraftSqlParser]] is injected via
  * `SparkSessionExtensions.injectParser` and pre-empts exactly these
  * shapes, delegating EVERYTHING else (including any ALTER on a
  * non-graft table) to Spark's parser — SQL stays a parser, not a
  * second engine: every statement routes to the SAME TxLog operator the
  * Scala API calls ([[TxLog.compact]] / [[TxLog.zorderOptimize]] /
  * [[TxLog.vacuum]] / [[TxLog.restore]] / [[TxLog.history]] /
  * [[TxLog.detail]] / [[TxLog.dropColumn]] / [[TxLog.renameColumn]]).
  * `ALTER TABLE … ADD COLUMN` needs no parser help (Spark parses and
  * analyzes it to the v1 command); [[TxSqlDmlStrategy]] intercepts that
  * command at planning and routes it to [[TxLog.addColumns]].
  *
  * The table may be named by a session-catalog identifier (resolved to
  * its storage path through the catalog, like the DML interceptions) or
  * by a quoted path literal (`OPTIMIZE '/data/t'`) for path-only users.
  *
  * DESCRIBE HISTORY/DETAIL build their (read-only, metadata-plane)
  * DataFrames at parse time — the same stance as the graft_tx_history /
  * graft_tx_read table functions, which also resolve manifests during
  * analysis. The mutating statements parse to a [[GraftMaintenance]]
  * command node and execute only when the command runs, so EXPLAIN
  * never compacts a table.
  */
case class GraftMaintenance(label: String, override val output: Seq[Attribute],
    run: SparkSession => Seq[Seq[Any]]) extends LeafNode with Command {
  override def producedAttributes: AttributeSet = outputSet
}

/** Physical exec for [[GraftMaintenance]]: runs the operation ONCE
  * (Spark may call executeCollect and doExecute on the same command
  * node) and converts the returned rows.
  */
case class TxCommandExec(label: String, output: Seq[Attribute],
    run: SparkSession => Seq[Seq[Any]]) extends LeafExecNode {
  private lazy val rows: Array[InternalRow] =
    run(SparkSession.active).map(r => InternalRow.fromSeq(r.map {
      case s: String => UTF8String.fromString(s)
      case other => other
    })).toArray
  override def executeCollect(): Array[InternalRow] = rows
  override protected def doExecute(): RDD[InternalRow] =
    sparkContext.parallelize(rows.toSeq, 1)
  override def nodeName: String = label
}

object GraftSqlParser {

  // one table reference: identifier chain (optionally backquoted parts)
  // or a single-quoted path literal
  private val ref = """((?:`[^`]+`|[\w.]+)+|'[^']+')"""
  private val ident = """(`[^`]+`|[\w]+)"""

  private val optimizeRe =
    s"""(?is)^\\s*OPTIMIZE\\s+$ref\\s*$$""".r
  private val optimizeWhereRe =
    s"""(?is)^\\s*OPTIMIZE\\s+$ref\\s+WHERE\\s+$ident\\s*=\\s*('[^']*'|[\\w.\\-]+)\\s*$$""".r
  private val optimizeByRe =
    s"""(?is)^\\s*OPTIMIZE\\s+$ref\\s+(ZORDER|HILBERT)\\s+BY\\s*\\(([^)]*)\\)\\s*$$""".r
  private val optimizeWhereByRe =
    s"""(?is)^\\s*OPTIMIZE\\s+$ref\\s+WHERE\\s+$ident\\s*=\\s*('[^']*'|[\\w.\\-]+)\\s+(ZORDER|HILBERT)\\s+BY\\s*\\(([^)]*)\\)\\s*$$""".r
  private val vacuumRe =
    s"""(?is)^\\s*VACUUM\\s+$ref\\s+RETAIN\\s+(\\d+)\\s+VERSIONS\\s*$$""".r
  private val vacuumDryRe =
    s"""(?is)^\\s*VACUUM\\s+$ref\\s+RETAIN\\s+(\\d+)\\s+VERSIONS\\s+DRY\\s+RUN\\s*$$""".r
  private val vacuumHoursRe =
    s"""(?is)^\\s*VACUUM\\s+$ref\\s+RETAIN\\s+(\\d+(?:\\.\\d+)?)\\s+HOURS\\s*$$""".r
  private val restoreRe =
    s"""(?is)^\\s*RESTORE\\s+(?:TABLE\\s+)?$ref\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*$$""".r
  private val restoreTsRe =
    s"""(?is)^\\s*RESTORE\\s+(?:TABLE\\s+)?$ref\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*$$""".r
  private val historyRe =
    s"""(?is)^\\s*DESC(?:RIBE)?\\s+HISTORY\\s+$ref\\s*$$""".r
  private val detailRe =
    s"""(?is)^\\s*DESC(?:RIBE)?\\s+DETAIL\\s+$ref\\s*$$""".r
  private val dropColRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$ref\\s+DROP\\s+COLUMN\\s+$ident\\s*$$""".r
  private val renameColRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$ref\\s+RENAME\\s+COLUMN\\s+$ident\\s+TO\\s+$ident\\s*$$""".r
  private val alterColTypeRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$ref\\s+(?:ALTER|CHANGE)\\s+COLUMN\\s+$ident\\s+(?:SET\\s+DATA\\s+)?TYPE\\s+(.+?)\\s*$$""".r
  private val setDefaultRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$ref\\s+(?:ALTER|CHANGE)\\s+COLUMN\\s+$ident\\s+SET\\s+DEFAULT\\s+(.+?)\\s*$$""".r
  private val dropDefaultRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$ref\\s+(?:ALTER|CHANGE)\\s+COLUMN\\s+$ident\\s+DROP\\s+DEFAULT\\s*$$""".r
  private val addConstraintRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$ref\\s+ADD\\s+CONSTRAINT\\s+$ident\\s+CHECK\\s*\\((.*)\\)\\s*$$""".r
  private val dropConstraintRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$ref\\s+DROP\\s+CONSTRAINT\\s+$ident\\s*$$""".r
  private val clusterByRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$ref\\s+CLUSTER\\s+BY\\s*\\(([^)]*)\\)\\s*$$""".r
  private val clusterByNoneRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$ref\\s+CLUSTER\\s+BY\\s+NONE\\s*$$""".r
  private val convertRe =
    """(?is)^\s*CONVERT\s+TO\s+GRAFT\s+'([^']+)'(\s+NO\s+STATISTICS)?\s*$""".r
  private val cloneRe =
    s"""(?is)^\\s*CREATE\\s+TABLE\\s+$ref\\s+(?:(SHALLOW|DEEP)\\s+)?CLONE\\s+$ref(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)|\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)')?\\s*$$""".r
  private val copyIntoRe =
    s"""(?is)^\\s*COPY\\s+INTO\\s+$ref\\s+FROM\\s+'([^']+)'(?:\\s+FILEFORMAT\\s*=\\s*(\\w+))?(?:\\s+PATTERN\\s*=\\s*'([^']+)')?(?:\\s+FILES\\s*=\\s*\\(([^)]*)\\))?(?:\\s+FORMAT_OPTIONS\\s*\\(([^)]*)\\))?(?:\\s+COPY_OPTIONS\\s*\\(([^)]*)\\))?\\s*$$""".r
  private val reorgPurgeRe =
    s"""(?is)^\\s*REORG\\s+TABLE\\s+$ref\\s+APPLY\\s*\\(\\s*PURGE\\s*\\)\\s*$$""".r
  private val generateRe =
    s"""(?is)^\\s*GENERATE\\s+symlink_format_manifest\\s+FOR\\s+TABLE\\s+$ref\\s*$$""".r

  private def unquote(part: String): String =
    if (part.startsWith("`")) part.stripPrefix("`").stripSuffix("`") else part

  /** Resolve a statement's table reference to a graft table's storage
    * path: a quoted literal IS the path; an identifier goes through the
    * session catalog and must name a graft-txlog table. `strict = false`
    * returns None for a non-graft identifier (the caller delegates to
    * Spark's parser, preserving native behavior); `strict = true` fails
    * loudly — the statement has no Spark fallback, so a clear message
    * beats Spark's generic ParseException.
    */
  private def resolve(r: String, stmt: String,
      strict: Boolean): Option[(String, Option[TableIdentifier])] = {
    if (r.startsWith("'"))
      return Some((r.stripPrefix("'").stripSuffix("'"), None))
    val parts = r.split('.').map(unquote)
    val tid = TableIdentifier(parts.last,
      if (parts.length > 1) Some(parts(parts.length - 2)) else None)
    TxSqlDmlStrategy.txTableOf(tid) match {
      case Some(path) => Some((path, Some(tid)))
      case None if strict => throw new IllegalArgumentException(
        s"$stmt: '$r' is not a graft-txlog table (register it with " +
          "CREATE TABLE … USING `graft-txlog` OPTIONS (path …), or name " +
          "the table root as a quoted path literal)")
      case None => None
    }
  }

  /** After a schema-changing statement (DDL, or a RESTORE crossing a
    * schema boundary), write the table's LIVE logical schema through to
    * the session catalog: the catalog relation validates its stored
    * schema against the source on every read, so a stale catalog entry
    * would reject the very table the statement just evolved. Skipped
    * for path-literal targets (nothing registered to drift).
    */
  private[plans] def syncCatalog(spark: SparkSession,
      ident: Option[TableIdentifier], path: String): Unit =
    ident.filter(spark.sessionState.catalog.tableExists).foreach { id =>
      val cat = spark.sessionState.catalog
      val live = TxLog.read(spark, path).schema
      val meta = cat.getTableMetadata(id)
      if (meta.dataSchema != live) {
        // pure widening (schema evolution) goes through
        // alterTableDataSchema — the only schema-change path the Hive
        // external catalog honors; drops/renames need the full
        // alterTable (which alterTableDataSchema refuses), honored by
        // the in-memory catalog and metastores that accept it
        val widened = live.fields.length >= meta.dataSchema.fields.length &&
          live.fields.take(meta.dataSchema.fields.length).toSeq
            .map(f => (f.name, f.dataType)) ==
          meta.dataSchema.fields.toSeq.map(f => (f.name, f.dataType))
        if (widened) cat.alterTableDataSchema(id, live)
        else cat.alterTable(meta.copy(schema =
          StructType(live.fields ++ meta.partitionSchema.fields)))
      }
      cat.refreshTable(id)
    }

  /** `'2026-01-01 12:00:00'` (JDBC, JVM-default zone) or ISO-8601
    * instant (`2026-01-01T12:00:00Z`) — the two spellings users paste.
    */
  private def parseTsMillis(ts: String): Long =
    try java.sql.Timestamp.valueOf(ts).getTime
    catch {
      case _: IllegalArgumentException =>
        java.time.Instant.parse(ts).toEpochMilli
    }

  private def longAttr(name: String): Attribute =
    AttributeReference(name, LongType, nullable = false)()

  /** Default rewrite width for `OPTIMIZE … BY`: keep the table's
    * recorded byte volume in ~128 MB files (the same target
    * [[TxLog.compact]] uses), falling back to the current live file
    * count when no sizes were recorded.
    */
  private def targetFiles(spark: SparkSession, path: String): Int = {
    val m = TxLog.manifest(spark, path)
    val bytes = m.stats.getOrElse(Seq.empty).flatMap(_.bytes).sum
    if (bytes > 0L) math.max(1L, (bytes + (128L << 20) - 1) / (128L << 20)).toInt
    else math.max(1, m.files.size)
  }

  /** The maintenance grammar: Some(plan) when the statement is ours. */
  def parseMaintenance(sqlText: String): Option[LogicalPlan] = sqlText match {
    case copyIntoRe(r, from, fmt, pat, fileList, fmtOpts, copyOpts) =>
      // COPY INTO t FROM '<landing>' [FILEFORMAT = PARQUET|ORC|JSON|CSV]
      //   [PATTERN = '<glob>'] [FILES = ('f1', 'f2', …)]
      //   [FORMAT_OPTIONS ('header' = 'false', …)]
      // — the idempotent-ingest operator as SQL. json/csv need a
      // schema: the TARGET table's declared (manifest) schema IS the
      // schema, so an existing table ingests them directly; only a
      // never-committed target still fails loudly (nothing declares
      // the shape, and inference is a full extra landing pass).
      resolve(r, "COPY INTO", strict = true).map { case (path, ident) =>
        val format = Option(fmt).map(_.toLowerCase).getOrElse("parquet")
        require(Set("parquet", "orc", "json", "csv")(format),
          s"COPY INTO (SQL) supports FILEFORMAT = PARQUET | ORC | " +
            s"JSON | CSV, not '$fmt'")
        val files = Option(fileList).map(_.split(',').toSeq
          .map(s => unquote(s.trim.stripPrefix("'").stripSuffix("'")))
          .filter(_.nonEmpty))
        files.foreach(fl => require(fl.nonEmpty,
          "COPY INTO (SQL): FILES = () names no files"))
        // FORMAT_OPTIONS ('k' = 'v', …): reader options, e.g. a
        // headerless csv landing via 'header' = 'false'
        val optRe = """'([^']*)'\s*=\s*'([^']*)'""".r
        val options: Map[String, String] = Option(fmtOpts)
          .map(txt => optRe.findAllMatchIn(txt)
            .map(m2 => m2.group(1) -> m2.group(2)).toMap)
          .getOrElse(Map.empty)
        // COPY_OPTIONS ('force' = 'true'): re-ingest listed files
        // regardless of the ledger — explicit duplicate acceptance
        val copyOptions: Map[String, String] = Option(copyOpts)
          .map(txt => optRe.findAllMatchIn(txt)
            .map(m2 => m2.group(1) -> m2.group(2)).toMap)
          .getOrElse(Map.empty)
        copyOptions.keys.foreach(k => require(k.equalsIgnoreCase("force"),
          s"COPY INTO (SQL): unsupported COPY_OPTIONS key '$k' (force)"))
        val force = copyOptions.exists { case (k, v) =>
          k.equalsIgnoreCase("force") && v.equalsIgnoreCase("true") }
        GraftMaintenance("graft_copy_into",
          Seq(longAttr("version"), longAttr("files_ingested"),
            longAttr("rows_ingested")), { spark =>
          val schema =
            if (format != "json" && format != "csv") None
            else Some(TxLog.latestVersion(spark, path).map(v =>
              TxLog.logicalSchemaAt(spark, path, v)).getOrElse(sys.error(
              s"COPY INTO (SQL, $format): target $path has no committed " +
                "schema to read the landing with — commit the table " +
                "first, or use TxLog.copyInto(..., schema = Some(...))")))
          val res =
            TxLog.copyInto(spark, from, path, format = format,
              schema = schema, pattern = Option(pat), files = files,
              options = options, force = force)
          syncCatalog(spark, ident, path) // refresh the cached relation
          Seq(Seq(res.version, res.filesIngested, res.rowsIngested))
        })
      }
    case reorgPurgeRe(r) =>
      // materialize deletion vectors WITHOUT a full compaction — cost
      // proportional to the vectored files only
      resolve(r, "REORG TABLE", strict = true).map { case (path, _) =>
        GraftMaintenance("graft_reorg_purge", Seq(longAttr("version")),
          spark => Seq(Seq(TxLog.purgeDvs(spark, path))))
      }
    case generateRe(r) =>
      // symlink manifests for external (Presto/Trino-class) readers —
      // one row per written manifest file
      resolve(r, "GENERATE", strict = true).map { case (path, _) =>
        GraftMaintenance("graft_generate",
          Seq(AttributeReference("manifest", StringType, nullable = false)()),
          spark => TxLog.generateSymlinkManifest(spark, path).map(Seq(_)))
      }
    case optimizeByRe(r, curve, colsCsv) =>
      resolve(r, "OPTIMIZE", strict = true).map { case (path, _) =>
        val cols = colsCsv.split(',').map(c => unquote(c.trim)).filter(_.nonEmpty).toSeq
        require(cols.nonEmpty, "OPTIMIZE … BY needs at least one column")
        val c = curve.toLowerCase
        GraftMaintenance("graft_optimize", Seq(longAttr("version")), { spark =>
          Seq(Seq(TxLog.zorderOptimize(spark, path, cols,
            targetFiles(spark, path), Map.empty,
            curve = if (c == "hilbert") "hilbert" else "morton")))
        })
      }
    case optimizeWhereByRe(r, c, v, curve, colsCsv) =>
      // partition-scoped re-clustering (the Delta
      // `OPTIMIZE t WHERE part = v ZORDER BY (…)` maintenance-window
      // shape): only the matching partition's files rewrite
      resolve(r, "OPTIMIZE", strict = true).map { case (path, _) =>
        val column = unquote(c)
        val value: Any =
          if (v.startsWith("'")) v.stripPrefix("'").stripSuffix("'") else v
        val cols = colsCsv.split(',').map(x => unquote(x.trim))
          .filter(_.nonEmpty).toSeq
        require(cols.nonEmpty, "OPTIMIZE … BY needs at least one column")
        val cl = curve.toLowerCase
        GraftMaintenance("graft_optimize", Seq(longAttr("version")), { spark =>
          Seq(Seq(TxLog.zorderOptimize(spark, path, cols,
            targetFiles(spark, path), Map(column -> value),
            curve = if (cl == "hilbert") "hilbert" else "morton")))
        })
      }
    case optimizeWhereRe(r, c, v) =>
      // partition-scoped compaction: one equality on a partition column
      resolve(r, "OPTIMIZE", strict = true).map { case (path, _) =>
        val column = unquote(c)
        val value: Any =
          if (v.startsWith("'")) v.stripPrefix("'").stripSuffix("'") else v
        GraftMaintenance("graft_optimize", Seq(longAttr("version")),
          spark => Seq(Seq(TxLog.compact(spark, path,
            partition = Map(column -> value)))))
      }
    case optimizeRe(r) =>
      resolve(r, "OPTIMIZE", strict = true).map { case (path, _) =>
        GraftMaintenance("graft_optimize", Seq(longAttr("version")),
          spark => Seq(Seq(TxLog.compact(spark, path))))
      }
    case vacuumHoursRe(r, h) =>
      resolve(r, "VACUUM", strict = true).map { case (path, _) =>
        GraftMaintenance("graft_vacuum", Seq(longAttr("deleted_files")),
          spark => Seq(Seq(
            TxLog.vacuumRetainHours(spark, path, h.toDouble).size.toLong)))
      }
    case vacuumDryRe(r, n) =>
      // what the reap WOULD delete, one path per row, nothing touched
      resolve(r, "VACUUM", strict = true).map { case (path, _) =>
        GraftMaintenance("graft_vacuum_dry",
          Seq(AttributeReference("path", StringType, nullable = false)()),
          spark => TxLog.vacuumDryRun(spark, path, keepVersions = n.toInt)
            .map(Seq(_)))
      }
    case vacuumRe(r, n) =>
      resolve(r, "VACUUM", strict = true).map { case (path, _) =>
        GraftMaintenance("graft_vacuum", Seq(longAttr("deleted_files")),
          spark => Seq(Seq(
            TxLog.vacuum(spark, path, keepVersions = n.toInt).size.toLong)))
      }
    case restoreTsRe(r, ts) =>
      resolve(r, "RESTORE", strict = true).map { case (path, ident) =>
        GraftMaintenance("graft_restore", Seq(longAttr("version")), { spark =>
          val out = TxLog.restoreToTimestamp(spark, path, parseTsMillis(ts))
          syncCatalog(spark, ident, path) // restore can cross a schema DDL
          Seq(Seq(out))
        })
      }
    case restoreRe(r, v) =>
      resolve(r, "RESTORE", strict = true).map { case (path, ident) =>
        GraftMaintenance("graft_restore", Seq(longAttr("version")), { spark =>
          val out = TxLog.restore(spark, path, v.toLong)
          syncCatalog(spark, ident, path) // restore can cross a schema DDL
          Seq(Seq(out))
        })
      }
    case historyRe(r) =>
      resolve(r, "DESCRIBE HISTORY", strict = true).map { case (path, _) =>
        TxLog.history(SparkSession.active, path).queryExecution.logical
      }
    case detailRe(r) =>
      resolve(r, "DESCRIBE DETAIL", strict = true).map { case (path, _) =>
        TxLog.detail(SparkSession.active, path).queryExecution.logical
      }
    case addConstraintRe(r, n, e) =>
      // CHECK constraints as SQL (the Delta ALTER TABLE ADD CONSTRAINT
      // surface): routes to the operator that scans live rows first
      resolve(r, "ALTER TABLE", strict = false).map { case (path, _) =>
        GraftMaintenance("graft_add_constraint", Seq(longAttr("version")),
          spark => Seq(Seq(
            TxLog.addConstraint(spark, path, unquote(n), e.trim))))
      }
    case dropConstraintRe(r, n) =>
      resolve(r, "ALTER TABLE", strict = false).map { case (path, _) =>
        GraftMaintenance("graft_drop_constraint", Seq(longAttr("version")),
          spark => Seq(Seq(TxLog.dropConstraint(spark, path, unquote(n)))))
      }
    case clusterByNoneRe(r) =>
      // the Delta liquid-clustering spelling, mapped onto the
      // cluster-on-write table property
      resolve(r, "ALTER TABLE", strict = false).map { case (path, _) =>
        GraftMaintenance("graft_cluster_by", Seq(longAttr("version")),
          spark => Seq(Seq(TxLog.unsetProperty(spark, path, TxLog.clusterByKey))))
      }
    case clusterByRe(r, colsCsv) =>
      resolve(r, "ALTER TABLE", strict = false).map { case (path, _) =>
        val cols = colsCsv.split(',').map(c => unquote(c.trim))
          .filter(_.nonEmpty).toSeq
        require(cols.nonEmpty, "ALTER TABLE … CLUSTER BY needs at least " +
          "one column (or CLUSTER BY NONE to drop the layout)")
        GraftMaintenance("graft_cluster_by", Seq(longAttr("version")),
          spark => Seq(Seq(TxLog.setProperty(spark, path,
            TxLog.clusterByKey, cols.mkString(",")))))
      }
    case dropColRe(r, c) =>
      // non-strict: an ALTER on a non-graft table is Spark's statement
      resolve(r, "ALTER TABLE", strict = false).map { case (path, ident) =>
        val column = unquote(c)
        GraftMaintenance("graft_drop_column", Nil, { spark =>
          TxLog.dropColumn(spark, path, column)
          syncCatalog(spark, ident, path)
          Nil
        })
      }
    case setDefaultRe(r, c, e) =>
      // write-time column default (applies when an appending frame
      // OMITS the column); validated inside setColumnDefault
      resolve(r, "ALTER TABLE", strict = false).map { case (path, _) =>
        val column = unquote(c)
        GraftMaintenance("graft_set_default", Seq(longAttr("version")),
          spark => Seq(Seq(
            TxLog.setColumnDefault(spark, path, column, e.trim))))
      }
    case dropDefaultRe(r, c) =>
      resolve(r, "ALTER TABLE", strict = false).map { case (path, _) =>
        val column = unquote(c)
        GraftMaintenance("graft_drop_default", Seq(longAttr("version")),
          spark => Seq(Seq(TxLog.dropColumnDefault(spark, path, column))))
      }
    case alterColTypeRe(r, c, ty) =>
      // metadata-only type widening — parse the DDL type eagerly so an
      // unparseable type fails at the statement, not inside the commit
      resolve(r, "ALTER TABLE", strict = false).map { case (path, ident) =>
        val column = unquote(c)
        val to = org.apache.spark.sql.types.DataType.fromDDL(ty.trim)
        GraftMaintenance("graft_alter_column", Seq(longAttr("version")), { spark =>
          val v = TxLog.alterColumnType(spark, path, column, to)
          syncCatalog(spark, ident, path)
          Seq(Seq(v))
        })
      }
    case cloneRe(dst, kind, src, ver, ts) =>
      // src must already be a graft table (strict — cloning a non-graft
      // table is CONVERT's job); dst is a path literal, or a catalog
      // identifier that gets its default warehouse location and a
      // USING `graft-txlog` registration after the clone. Bare CLONE
      // (and DEEP CLONE) copy the data — the Delta default; SHALLOW
      // stays the zero-copy metadata fork.
      val shallow = Option(kind).exists(_.equalsIgnoreCase("SHALLOW"))
      resolve(src, "CLONE", strict = true).map { case (srcPath, _) =>
        GraftMaintenance("graft_clone", Seq(longAttr("version")), { spark =>
          val (dstPath, register) =
            if (dst.startsWith("'"))
              (dst.stripPrefix("'").stripSuffix("'"), None)
            else {
              val parts = dst.split('.').map(unquote)
              val tid = TableIdentifier(parts.last,
                if (parts.length > 1) Some(parts(parts.length - 2)) else None)
              require(!spark.sessionState.catalog.tableExists(tid),
                s"CLONE: table $dst already exists")
              (new org.apache.hadoop.fs.Path(
                spark.sessionState.catalog.defaultTablePath(tid)).toString,
                Some(tid))
            }
          // TIMESTAMP AS OF resolves through the monotonic in-commit
          // timestamps, exactly like time travel and RESTORE
          val asOf = Option(ver).map(_.toLong).orElse(Option(ts).map(t =>
            TxLog.versionAtTimestamp(spark, srcPath, parseTsMillis(t))))
          val v = if (shallow) TxLog.clone(spark, srcPath, dstPath, asOf)
                  else TxLog.deepClone(spark, srcPath, dstPath, asOf)
          register.foreach { tid =>
            spark.sql(s"CREATE TABLE ${tid.quotedString} USING `graft-txlog` " +
              s"OPTIONS (path '$dstPath')")
          }
          Seq(Seq(v))
        })
      }
    case convertRe(path, noStats) =>
      // always a PATH literal: the directory is not a graft table yet
      // (registering it in the catalog stays CREATE TABLE … USING's job)
      Some(GraftMaintenance("graft_convert", Seq(longAttr("version")),
        spark => Seq(Seq(TxLog.convert(spark, path,
          statsColumns = if (noStats != null) 0 else TxLog.maxStatsCols)))))
    case renameColRe(r, from, to) =>
      resolve(r, "ALTER TABLE", strict = false).map { case (path, ident) =>
        val (f, t) = (unquote(from), unquote(to))
        GraftMaintenance("graft_rename_column", Nil, { spark =>
          TxLog.renameColumn(spark, path, f, t)
          syncCatalog(spark, ident, path)
          Nil
        })
      }
    case _ => None
  }
}

/** Delegating parser: the graft maintenance grammar first, Spark's
  * parser for everything else. Injected via
  * `SparkSessionExtensions.injectParser`.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan = {
    val plan = GraftSqlParser.parseMaintenance(sqlText)
      .getOrElse(delegate.parsePlan(sqlText))
    // v1 time travel must be rewritten BEFORE analysis — see
    // TxTimeTravelRule's scaladoc
    TxTimeTravelRule(session).apply(plan)
  }
  override def parseExpression(s: String): Expression = delegate.parseExpression(s)
  override def parseTableIdentifier(s: String): TableIdentifier =
    delegate.parseTableIdentifier(s)
  override def parseFunctionIdentifier(s: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(s)
  override def parseMultipartIdentifier(s: String): Seq[String] =
    delegate.parseMultipartIdentifier(s)
  override def parseQuery(s: String): LogicalPlan = delegate.parseQuery(s)
  override def parseRoutineParam(s: String): StructType =
    delegate.parseRoutineParam(s)
  override def parseTableSchema(s: String): StructType =
    delegate.parseTableSchema(s)
  override def parseDataType(s: String): DataType = delegate.parseDataType(s)
}
