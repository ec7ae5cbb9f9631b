package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** Batch `DataFrameReader`/SQL relation over a [[TxLog]] table — the
  * Delta-style batch surface for the transactional layer:
  *
  * {{{
  *   spark.read.format("graft-txlog").load(table)                 // latest
  *   spark.read.format("graft-txlog")
  *     .option("versionAsOf", 3).load(table)                      // time travel
  *   df.write.format("graft-txlog").mode("append").save(table)
  *   sql("CREATE TABLE t USING `graft-txlog` OPTIONS (path '...')")
  *   sql("INSERT INTO t ...")          // transactional append
  *   sql("INSERT OVERWRITE TABLE t ...") // atomic snapshot overwrite
  * }}}
  *
  * The relation plans from the manifest exactly like [[TxLog.read]] /
  * [[TxLog.readAsOf]] (file list + stored schema; no directory listing),
  * and every `INSERT` goes through the same optimistic commit protocol
  * as the Scala API — a SQL writer cannot corrupt the log or race a
  * compaction. Scan-level filters and column pruning the engine hands a
  * v1 relation are replayed onto the inner manifest-read plan, so
  * predicates still reach the parquet row-group stats; the
  * `graft_tx_read` TVF remains the zero-overhead SQL read (it splices
  * the manifest plan directly into the caller's plan, keeping the whole
  * query in one codegen pipeline) — this relation is the surface that
  * additionally supports DDL, INSERT, and `DataFrameReader` options.
  *
  * The snapshot version is pinned at the relation's FIRST scan and kept
  * for its lifetime, so a `spark.read...load(t)` DataFrame is a
  * repeatable read — every action on it sees one version even as
  * writers commit. A catalog table's relation instance is cached by
  * Spark across queries; an `INSERT` through this relation un-pins it
  * (the next SELECT re-resolves the new latest), while commits from
  * OTHER sessions or processes follow the standard external-writer
  * contract: `REFRESH TABLE` (exactly as with Delta or parquet tables).
  */
class TxLogRelation(spark: SparkSession, table: String,
    versionAsOf: Option[Long]) extends BaseRelation
    with PrunedFilteredScan with InsertableRelation {

  override def sqlContext: SQLContext = spark.sqlContext

  private def latestOrFail: Long =
    TxLog.latestVersion(spark, table).getOrElse(sys.error(
      s"graft-txlog: $table has no committed versions yet - write it " +
        "first (df.write.format(\"graft-txlog\").save(path))"))

  // None until the first scan (or after an insert); a pinned value makes
  // every scan of this instance read the same committed version
  private var pinnedVersion: Option[Long] = versionAsOf

  private def pin(): Long = synchronized {
    pinnedVersion.getOrElse { val l = latestOrFail
      pinnedVersion = Some(l); l }
  }

  private def snapshot: DataFrame = TxLog.readAsOf(spark, table, pin())

  /** Per-file stats for the metadata-only aggregate rewrite
    * ([[graft.plans.TxMetadataAgg]]): the pinned snapshot's FileEntry
    * per live file, `None` when any file lacks its manifest entry (the
    * rule then leaves the scan alone — a metadata answer is never a
    * guess). Pins the snapshot version exactly like a scan would, so a
    * metadata-answered aggregate and a later scan of the same relation
    * instance agree on the version they describe.
    */
  private[graft] def pinnedStats: Option[Seq[TxLog.FileEntry]] = {
    val m = TxLog.manifestAt(spark, table, pin())
    val byPath = m.stats.getOrElse(Seq.empty).map(e => e.path -> e).toMap
    val entries = m.files.map(byPath.get)
    if (entries.forall(_.isDefined)) Some(entries.flatten) else None
  }

  /** Row count from [[pinnedStats]] — `None` when stats are incomplete. */
  private[graft] def metadataCount: Option[Long] =
    pinnedStats.map(_.map(_.rows).sum)

  override val schema: StructType = {
    import org.apache.spark.sql.types.DataType
    val v = versionAsOf.getOrElse(latestOrFail)
    DataType.fromJson(TxLog.manifestAt(spark, table, v).schemaJson)
      .asInstanceOf[StructType]
  }

  /** Data-source filters this relation replays onto the inner plan.
    * Anything translatable is claimed as handled; the engine keeps the
    * rest. Translation failing for one conjunct never loses rows —
    * unhandled filters are re-applied by Spark above the scan.
    */
  private def toColumn(f: Filter): Option[Column] = {
    def c(name: String) = col(s"`$name`")
    f match {
      case EqualTo(a, v)            => Some(c(a) === lit(v))
      case EqualNullSafe(a, v)      => Some(c(a) <=> lit(v))
      case GreaterThan(a, v)        => Some(c(a) > lit(v))
      case GreaterThanOrEqual(a, v) => Some(c(a) >= lit(v))
      case LessThan(a, v)           => Some(c(a) < lit(v))
      case LessThanOrEqual(a, v)    => Some(c(a) <= lit(v))
      case In(a, vs)                => Some(c(a).isin(vs.toSeq: _*))
      case IsNull(a)                => Some(c(a).isNull)
      case IsNotNull(a)             => Some(c(a).isNotNull)
      case StringStartsWith(a, v)   => Some(c(a).startsWith(v))
      case StringEndsWith(a, v)     => Some(c(a).endsWith(v))
      case StringContains(a, v)     => Some(c(a).contains(v))
      case And(l, r) => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
      case Or(l, r)  => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
      case Not(ch)   => toColumn(ch).map(not)
      case _         => None
    }
  }

  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters.filterNot(toColumn(_).isDefined)

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val filtered = filters.flatMap(toColumn)
      .foldLeft(snapshot)(_.filter(_))
    // zero requiredColumns (COUNT(*)) is an empty projection: Spark
    // counts the empty rows; the inner scan still prunes to no columns
    filtered.select(requiredColumns.toSeq.map(n => col(s"`$n`")): _*).rdd
  }

  /** SQL `INSERT INTO` (append) / `INSERT OVERWRITE` (atomic snapshot
    * replace), both through the optimistic commit loop. Spark aligns
    * the INSERT's columns to this schema by position before calling.
    */
  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    require(versionAsOf.isEmpty,
      s"graft-txlog: cannot INSERT through a versionAsOf=${versionAsOf.get} " +
        "time-travel relation - it is a read-only historical view")
    if (overwrite) TxLog.overwrite(data, table)
    else TxLog.append(data, table)
    // un-pin: Spark caches a catalog table's relation instance across
    // queries, so the next SELECT must re-resolve the new latest version
    synchronized { pinnedVersion = None }
  }
}
