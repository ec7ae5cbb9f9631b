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

  /** The table root path (for the SQL DML strategy). */
  private[graft] def tablePath: String = table

  /** True for a versionAsOf relation — a read-only historical view. */
  private[graft] def isTimeTravel: Boolean = versionAsOf.isDefined

  /** Drop the pinned snapshot so the next scan re-resolves the latest
    * version — called after any write that bypasses [[insert]] (the SQL
    * DML strategy commits through TxLog directly, and Spark caches a
    * catalog table's relation instance across queries).
    */
  private[graft] def unpin(): Unit = synchronized { pinnedVersion = None }

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
    // deletion vectors invalidate metadata ANSWERS (counts overcount,
    // min/max may describe deleted rows) — the aggregate rule must keep
    // the scan; stats PRUNING elsewhere stays safe (bounds only widen)
    if (m.dvs.exists(_.nonEmpty)) return None
    val byPath = m.stats.getOrElse(Seq.empty).map(e => e.path -> e).toMap
    val entries = m.files.map(byPath.get)
    if (entries.forall(_.isDefined)) Some(entries.flatten) else None
  }

  /** Row count from [[pinnedStats]] — `None` when stats are incomplete. */
  private[graft] def metadataCount: Option[Long] =
    pinnedStats.map(_.map(_.rows).sum)

  /** Per-column (min, max, nullCount) folded from the manifest's
    * per-file stats — CATALYST-typed values keyed by LOGICAL column
    * name, for the CBO's selectivity estimation (ANALYZE-free column
    * statistics, the "statistics from the log" stance). A column is
    * reported only when EVERY live file carries its stats (a partial
    * fold could understate the range); timestamps stay out (their
    * stats render is excluded from compares for the same reason
    * pruning excludes them). DV'd snapshots report nothing — the
    * folded values could describe deleted rows. Estimation-only
    * consumers: an off value can skew a plan choice, never an answer.
    */
  private[graft] def pinnedColumnStats
      : Map[String, (Option[Any], Option[Any], Long)] = {
    import org.apache.spark.sql.types._
    val entries = pinnedStats.getOrElse(return Map.empty)
    if (entries.isEmpty) return Map.empty
    val m = TxLog.manifestAt(spark, table, pin())
    def toCatalyst(dt: DataType, s: String): Option[Any] =
      try dt match {
        case ByteType => Some(s.toByte)
        case ShortType => Some(s.toShort)
        case IntegerType => Some(s.toInt)
        case LongType => Some(s.toLong)
        case FloatType => Some(s.toFloat)
        case DoubleType => Some(s.toDouble)
        case d: DecimalType =>
          Some(org.apache.spark.sql.types.Decimal(BigDecimal(s)))
        case DateType => Some(
          org.apache.spark.sql.catalyst.util.DateTimeUtils
            .fromJavaDate(java.sql.Date.valueOf(s)))
        case StringType => Some(
          org.apache.spark.unsafe.types.UTF8String.fromString(s))
        case _ => None
      } catch { case _: Exception => None }
    // fold order: numerics compare as BigDecimal, dates/strings as
    // their rendered strings (ISO dates order lexicographically)
    def ordered(dt: DataType, vs: Seq[String]): Option[(String, String)] =
      if (vs.isEmpty) None
      else dt match {
        case _: NumericType =>
          try {
            val ds = vs.map(v => BigDecimal(v) -> v)
            Some((ds.minBy(_._1)._2, ds.maxBy(_._1)._2))
          } catch { case _: Exception => None }
        case DateType | StringType => Some((vs.min, vs.max))
        case _ => None
      }
    schema.fields.iterator.flatMap { f =>
      val phys = TxLog.physOfAt(m, f.name)
      val per = entries.map(_.stats.get(phys))
      if (per.exists(_.isEmpty)) None // some file lacks this column
      else {
        val cs = per.flatten
        val nulls = cs.map(_.nulls).sum
        val mins = cs.flatMap(_.min)
        val maxs = cs.flatMap(_.max)
        (ordered(f.dataType, mins), ordered(f.dataType, maxs)) match {
          case (Some((lo, _)), Some((_, hi))) =>
            (toCatalyst(f.dataType, lo), toCatalyst(f.dataType, hi)) match {
              case (mn @ Some(_), mx @ Some(_)) =>
                Some(f.name -> (mn, mx, nulls))
              case _ => None
            }
          case _ if mins.isEmpty && maxs.isEmpty && cs.nonEmpty =>
            // an all-NULL column: no range, but the null count is exact
            Some(f.name -> ((None: Option[Any]), (None: Option[Any]), nulls))
          case _ => None
        }
      }
    }.toMap
  }

  /** Cost statistics for the join planner, straight from the manifest's
    * recorded per-file sizes (the same semantics HadoopFsRelation
    * reports: total on-disk bytes). This is what lets Spark
    * AUTO-BROADCAST a small transactional dimension table — without it
    * a v1 relation defaults to `defaultSizeInBytes` (effectively
    * infinite) and every join against it shuffles. Missing sizes (a
    * pre-statistics manifest) fall back to the safe default: never
    * broadcast on a guess.
    */
  override def sizeInBytes: Long = {
    val sizes = pinnedStats.map(_.map(_.bytes))
    sizes match {
      case Some(bs) if bs.forall(_.isDefined) => bs.flatten.sum
      case _ => super.sizeInBytes
    }
  }

  override val schema: StructType = {
    val v = versionAsOf.getOrElse(latestOrFail)
    TxLog.logicalSchemaAt(spark, table, v)
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
      // a big IN (the dynamic-file-pruning rule injects up to 10⁵ keys)
      // becomes ONE InSet node instead of 10⁵ literal children: hash-set
      // row eval, and the inner scan's own pushdown re-translates it for
      // parquet row-group skipping
      case In(a, vs) if vs.length > TxLogRelation.bigInThreshold =>
        schema.fields.find(_.name == a).map { fld =>
          val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
            .createToCatalystConverter(fld.dataType)
          org.apache.spark.sql.graftshim.Shim.column(
            org.apache.spark.sql.catalyst.expressions.InSet(
              org.apache.spark.sql.graftshim.Shim.expression(c(a)),
              vs.iterator.map(conv).toSet))
        }
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

  /** Manifest-level file skipping for the engine's pushed filters —
    * what makes a plain SQL `WHERE` on a graft-txlog table skip data
    * files at PLANNING time, exactly like `TxLog.readWhere` but
    * automatic. Each top-level filter is one conjunct; the translatable
    * comparisons become inclusive stats bounds (strict inequalities
    * widen to inclusive — may keep an extra file, never skips one
    * wrongly), `In` keeps a file if ANY value may match, and
    * IsNull/IsNotNull judge from the stored per-file null counts (the
    * IsNotNull conjunct Spark adds for every referenced column prunes
    * all-NULL files for free). Timestamp values are excluded: their
    * `toString` render (trailing ".0") differs from the stats' render,
    * and a domain mismatch could skip wrongly — dates, numerics, and
    * strings render identically on both sides. Missing evidence always
    * keeps the file.
    */
  /** Conjuncts DERIVED from filters on a GENERATED column's source
    * ([[GeneratedDerivation]]): `WHERE o_orderdate BETWEEN a AND b` on
    * a table generated-partitioned by `o_year = year(o_orderdate)`
    * implies `o_year BETWEEN year(a) AND year(b)` — the conjunct that
    * makes the partition layout prune for raw-source queries. Derived
    * filters feed ONLY the manifest-level pruning (rows already satisfy
    * them by construction — the write path computed the column).
    */
  private def derivedGenerated(m: TxLog.Manifest,
      filters: Array[Filter]): Array[Filter] = {
    val gen = m.generated.getOrElse(Map.empty)
    if (gen.isEmpty || filters.isEmpty) return Array.empty
    gen.toSeq.flatMap { case (g, exprSql) =>
      GeneratedDerivation.classify(spark, exprSql).toSeq.flatMap {
        case (src0, shape) =>
          schema.fields.find(_.name.equalsIgnoreCase(src0)).toSeq.flatMap { sf =>
            val src = sf.name
            def f1(v: Any): Option[Any] = GeneratedDerivation
              .derive(spark, exprSql, src, sf.dataType, Seq(v)).map(_.head)
            val eqs = filters.toSeq.collect {
              case EqualTo(a, v) if a == src && v != null => v }
              .flatMap(v => f1(v).map(d => EqualTo(g, d)))
            val ins = filters.toSeq.collect {
              case In(a, vs) if a == src && vs.nonEmpty &&
                vs.forall(_ != null) => vs }
              .flatMap(vs => GeneratedDerivation
                .derive(spark, exprSql, src, sf.dataType, vs.toSeq)
                .map(ds => In(g, ds.distinct.toArray)))
            val los = filters.toSeq.collect {
              case GreaterThan(a, v) if a == src && v != null => v
              case GreaterThanOrEqual(a, v) if a == src && v != null => v }
            val his = filters.toSeq.collect {
              case LessThan(a, v) if a == src && v != null => v
              case LessThanOrEqual(a, v) if a == src && v != null => v }
            // strict source bounds widen to INCLUSIVE generated bounds:
            // f is only nondecreasing, so src > v still allows g = f(v)
            val ranges = shape match {
              case GeneratedDerivation.Monotone =>
                los.flatMap(v => f1(v).map(d => GreaterThanOrEqual(g, d))) ++
                his.flatMap(v => f1(v).map(d => LessThanOrEqual(g, d)))
              case GeneratedDerivation.SamePeriod(fmt)
                  if los.nonEmpty && his.nonEmpty && los.size == 1 &&
                    his.size == 1 && GeneratedDerivation.samePeriod(
                      spark, fmt, src, sf.dataType, los.head, his.head) =>
                f1(los.head).map(d => GreaterThanOrEqual(g, d)).toSeq ++
                f1(his.head).map(d => LessThanOrEqual(g, d)).toSeq
              case _ => Seq.empty[Filter]
            }
            eqs ++ ins ++ ranges
          }
      }
    }.toArray
  }

  private def prunedFiles(filters0: Array[Filter]): Seq[String] = {
    import org.apache.spark.sql.types._
    val m = TxLog.manifestAt(spark, table, pin())
    val filters = filters0 ++ derivedGenerated(m, filters0)
    // filters reference LOGICAL names; stats/bloom evidence is keyed by
    // PHYSICAL names — translate for the metadata lookups
    def domain(name: String, v: Any): Option[(String, DataType)] = {
      if (v == null) return None
      val field = schema.fields.find(_.name == name)
      field.map(_.dataType).collect {
        case dt: NumericType => (TxLog.physOfAt(m, name), dt)
        case StringType => (TxLog.physOfAt(m, name), StringType)
        case DateType => (TxLog.physOfAt(m, name), DateType)
      }
    }
    val bounds = filters.toSeq.flatMap {
      case EqualTo(a, v) => domain(a, v).map { case (n, dt) =>
        (n, dt, Some(v.toString), Some(v.toString)) }
      case GreaterThan(a, v) => domain(a, v).map { case (n, dt) =>
        (n, dt, Some(v.toString), None) }
      case GreaterThanOrEqual(a, v) => domain(a, v).map { case (n, dt) =>
        (n, dt, Some(v.toString), None) }
      case LessThan(a, v) => domain(a, v).map { case (n, dt) =>
        (n, dt, None, Some(v.toString)) }
      case LessThanOrEqual(a, v) => domain(a, v).map { case (n, dt) =>
        (n, dt, None, Some(v.toString)) }
      case _ => None
    }
    val nullness = filters.toSeq.flatMap {
      case IsNull(a) => Some((TxLog.physOfAt(m, a), true))
      case IsNotNull(a) => Some((TxLog.physOfAt(m, a), false))
      case _ => None
    }
    // In(a, vs): a file survives if ANY listed value may match. Small
    // lists run the per-value conjunct loop; big lists (the DFP rule
    // injects up to 10⁵ keys) take the one-sort window prune, whose
    // cost is O(files × log values) with capped in-window bloom probes
    val (smallIns, bigIns) = filters.toSeq.collect {
      case In(a, vs) if vs.nonEmpty && vs.forall(_ != null) => (a, vs)
    }.partition(_._2.length <= TxLogRelation.bigInThreshold)
    val inKept: Seq[Seq[String]] = smallIns.flatMap { case (a, vs) =>
      domain(a, vs.head).map { case (n, dt) =>
        vs.toSeq.flatMap(v => TxLog.pruneByConjuncts(m, schema,
          Seq((n, dt, Some(v.toString), Some(v.toString))))).distinct
      }
    }
    val base = TxLog.pruneByConjuncts(m, schema, bounds, nullness)
    val statsKept = inKept.foldLeft(base)((acc, keep) => acc.filter(keep.toSet))
    val afterBigIns = bigIns.foldLeft(statsKept) { case (acc, (a, vs)) =>
      // stats-domain columns only: the window compare needs the same
      // rendering the stats store (timestamps are excluded for exactly
      // the reason documented above)
      domain(a, vs.head) match {
        case Some((n, dt)) =>
          TxLog.pruneByValueSet(spark, table, m, n, dt, vs.toSeq, acc)
        case None => acc
      }
    }
    // equality/IN conjuncts on bloom-indexed columns additionally probe
    // the per-file sidecar filters — point-lookup pruning where min/max
    // stats cannot help (untyped nulls never reach the probes). Big INs
    // already ran their capped, window-restricted probes above.
    val probes = filters.toSeq.flatMap {
      case EqualTo(a, v) if v != null =>
        schema.fields.find(_.name == a).map(f =>
          (TxLog.physOfAt(m, a), f.dataType, Seq(v)))
      case In(a, vs) if vs.nonEmpty && vs.forall(_ != null) &&
          vs.length <= TxLogRelation.bigInThreshold =>
        schema.fields.find(_.name == a).map(f =>
          (TxLog.physOfAt(m, a), f.dataType, vs.toSeq))
      case _ => None
    }
    TxLog.bloomPrune(spark, table, m, afterBigIns, probes)
  }

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val kept = prunedFiles(filters)
    TxLogRelation.lastScanFileCount = kept.size
    TxLogRelation.scanCounts.merge(table, Integer.valueOf(1),
      (a, b) => Integer.valueOf(a.intValue + b.intValue))
    val snap = TxLog.readFilesAsOf(spark, table, pin(), kept)
    val filtered = filters.flatMap(toColumn).foldLeft(snap)(_.filter(_))
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
    unpin()
  }
}

private[graft] object TxLogRelation {
  /** Test observability: how many files the most recent [[buildScan]]
    * planned after manifest-level skipping (a v1 relation exposes no
    * FileIndex for `df.inputFiles` to count).
    */
  @volatile var lastScanFileCount: Int = -1

  /** IN lists longer than this take the one-sort window prune
    * ([[TxLog.pruneByValueSet]]) instead of the per-value conjunct loop,
    * and become a single `InSet` node instead of a literal list.
    */
  val bigInThreshold: Int = 64

  /** Test observability: [[TxLogRelation!.buildScan]] invocations per
    * table path — lets specs assert a dynamic-file-pruning dim was
    * executed exactly once (at planning, for the frozen LocalRelation)
    * rather than re-scanned by the runtime join.
    */
  val scanCounts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
}
