package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.sources.TxLog

/** Structured Streaming SOURCE over a [[graft.sources.TxLog]] table —
  * the public Delta streaming-source recipe: offsets are commit-log
  * versions, so the stream needs no directory listing, no file
  * modification times, and no "new file" heuristics. The engine's
  * checkpointed offset is just a version number; everything between two
  * versions is read straight from the files those commits added.
  *
  * {{{
  *   spark.readStream.format("graft-txlog")
  *     .option("path", table).load()
  * }}}
  *
  * Batch semantics:
  *  - the FIRST batch is the full snapshot at the stream's start
  *    version (every manifest-listed file — a reprocessing-friendly
  *    initial load, like Delta's default);
  *  - every later batch is the rows of the append commits in
  *    `(lastOffset, newOffset]`, read from ONLY the files those appends
  *    added (cost ∝ new data, never table size);
  *  - a non-append commit (overwrite/delete/update/compact) mid-stream
  *    FAILS the stream loudly — its file rewrites would be re-emitted
  *    as phantom inserts. `.option("ignoreChanges", "true")` instead
  *    skips non-append commits entirely (their file changes produce no
  *    batch rows), the documented Delta escape hatch.
  *
  * Pairs with [[graft.sources.TxLog.idempotentAppend]] in a
  * `foreachBatch` sink for an exactly-once table-to-table pipe: this
  * source replays a batch after a crash with the SAME version range,
  * and the sink's (appId, batchId) watermark commits it once.
  *
  * Restart correctness: the engine hands back checkpointed offsets as
  * opaque `SerializedOffset`s; [[TxLogSourceOffset.versionOf]] parses
  * by json value, never by class, so resumed and live offsets compare
  * equal. Vacuuming versions newer than the checkpoint is safe;
  * vacuuming PAST it fails the restart loudly (manifest gone).
  */
class TxLogStream extends StreamSourceProvider with StreamSinkProvider
    with RelationProvider with CreatableRelationProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-txlog"

  /** Batch READ (`spark.read.format("graft-txlog")`, SQL
    * `CREATE TABLE ... USING` + SELECT/INSERT): see
    * [[graft.sources.TxLogRelation]]. `versionAsOf` time-travels.
    */
  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    new graft.sources.TxLogRelation(sqlContext.sparkSession,
      pathOf(parameters), parameters.get("versionAsOf").map(_.toLong))

  /** Batch WRITE (`df.write.format("graft-txlog").mode(...).save(path)`,
    * SQL `CREATE TABLE ... USING ... AS SELECT`): every mode lands as
    * ONE atomic commit — Overwrite is the snapshot replace, Append the
    * optimistic append (creating the table on first write), and
    * ErrorIfExists/Ignore gate on whether the log has any version.
    * `.option("partitionBy", "a,b")` lays the table out Hive-partitioned
    * on those columns (the v1 writer API drops `df.write.partitionBy`,
    * so the layout rides an option): Overwrite (re)sets the layout;
    * table-creating writes adopt it; an append to an EXISTING table
    * inherits the table's layout and fails loudly if the option names a
    * different one.
    */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val path = pathOf(parameters)
    require(!parameters.contains("versionAsOf"),
      "graft-txlog: versionAsOf is a read option - writes always commit " +
        "a new version on top of the latest")
    val spark = sqlContext.sparkSession
    val exists = TxLog.latestVersion(spark, path).isDefined
    val optPb: Option[Seq[String]] = parameters.get("partitionBy")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    def create(): Unit = TxLog.overwrite(data, path, partitionBy = optPb)
    def appendExisting(): Unit = {
      val tablePb = TxLog.tablePartitionBy(spark, path)
      optPb.foreach(pb => require(pb == tablePb,
        s"graft-txlog: append partitionBy option [${pb.mkString(", ")}] " +
          s"does not match $path's layout [${tablePb.mkString(", ")}] — " +
          "appends inherit the table's partitioning"))
      TxLog.append(data, path)
    }
    mode match {
      case SaveMode.Overwrite => TxLog.overwrite(data, path, partitionBy = optPb)
      case SaveMode.Append => if (exists) appendExisting() else create()
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(
          s"graft-txlog: $path already has committed versions " +
            "(mode=ErrorIfExists)")
        else create()
      case SaveMode.Ignore => if (!exists) create()
    }
    createRelation(sqlContext, parameters)
  }

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-txlog source needs .option(\"path\", <table root>)"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val path = pathOf(parameters)
    val inferred = schema.orElse {
      TxLog.latestVersion(sqlContext.sparkSession, path).map { _ =>
        TxLog.read(sqlContext.sparkSession, path).schema
      }
    }.getOrElse(throw new IllegalArgumentException(
      s"graft-txlog: table $path has no committed versions yet - " +
        "pass an explicit .schema(...) to stream a not-yet-created table"))
    val out =
      if (!cdfOf(parameters)) inferred
      else StructType(inferred.fields.filterNot(f =>
          f.name == "_change_type" || f.name == "_commit_version"))
        .add("_change_type", org.apache.spark.sql.types.StringType)
        .add("_commit_version", org.apache.spark.sql.types.LongType)
    (shortName(), out)
  }

  private def cdfOf(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.toBoolean)

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val path = pathOf(parameters)
    val fixed = sourceSchema(sqlContext, schema, providerName, parameters)._2
    val maxV = parameters.get("maxVersionsPerTrigger").map(_.toLong)
    maxV.foreach(v => require(v >= 1, "maxVersionsPerTrigger must be >= 1"))
    val maxB = parameters.get("maxBytesPerTrigger").map(_.toLong)
    maxB.foreach(b => require(b >= 1, "maxBytesPerTrigger must be >= 1"))
    val maxF = parameters.get("maxFilesPerTrigger").map(_.toLong)
    maxF.foreach(n => require(n >= 1, "maxFilesPerTrigger must be >= 1"))
    val tracking = parameters.get("schemaTrackingLocation")
    tracking.foreach(loc =>
      SchemaTracking.advance(sqlContext.sparkSession, loc, path, fixed))
    new TxLogSource(sqlContext.sparkSession, path, fixed,
      ignoreChanges = parameters.get("ignoreChanges").exists(_.toBoolean),
      changeFeed = cdfOf(parameters),
      maxVersionsPerTrigger = maxV,
      maxBytesPerTrigger = maxB,
      maxFilesPerTrigger = maxF,
      startingVersion = parameters.get("startingVersion").map(_.toLong),
      schemaTracked = tracking.isDefined)
  }

  /** Transactional streaming SINK:
    * {{{
    *   df.writeStream.format("graft-txlog")
    *     .option("path", table).option("txnAppId", "loader")
    *     .option("checkpointLocation", cp).start()
    * }}}
    * Append mode commits each micro-batch through
    * [[graft.sources.TxLog.idempotentAppend]] under `txnAppId` — a
    * replayed batch (crash between sink commit and checkpoint write,
    * or a wiped checkpoint restarting batch ids) lands exactly once.
    * `txnAppId` defaults to the checkpoint location, which survives a
    * normal restart; set it explicitly if the checkpoint itself may be
    * rebuilt, or the replayed ids would arrive under a fresh app
    * identity and double-append. Complete mode atomically OVERWRITES
    * the table with each batch (the snapshot-publish pattern for
    * aggregate serving tables). UPDATE mode with
    * `.option("mergeKeys", "k1,k2")` UPSERTS each micro-batch through
    * the general MERGE (star update/insert by key) under the same
    * watermark — exactly-once streaming CDC upserts with no
    * foreachBatch; the table's `graft.dml.*` properties choose the
    * DV / change-feed cost shapes. First batch into a missing table
    * creates it. `writeStream.partitionBy(cols)` lays a table-CREATING
    * stream out Hive-partitioned; a stream into an existing table must
    * name the table's own layout (or none — appends inherit it).
    */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    val path = pathOf(parameters)
    val appId = parameters.get("txnAppId")
      .orElse(parameters.get("checkpointLocation"))
      .getOrElse(throw new IllegalArgumentException(
        "graft-txlog sink needs .option(\"txnAppId\", ...) (or a " +
          "checkpointLocation to default the transaction identity from)"))
    val autoCompact = parameters.get("autoCompactMinFiles").map { v =>
      val n = v.toInt
      require(n >= 2, s"autoCompactMinFiles must be >= 2, got $n")
      n
    }
    val smallBytes = parameters.get("autoCompactSmallBytes")
      .map(_.toLong).getOrElse(16L << 20)
    val mergeKeys = parameters.get("mergeKeys")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    new TxLogSink(path, appId, outputMode, partitionColumns,
      autoCompact, smallBytes, mergeKeys)
  }
}

/** `autoCompactMinFiles` is the Delta auto-optimize recipe for the
  * classic streaming pathology — a long-running micro-batch ingest
  * fragments the table into thousands of tiny files: after each
  * committed batch the sink counts the manifest's sub-threshold files
  * (metadata only — per-file sizes live in the manifest) and runs an
  * OPTIMIZE bin-packing pass when at least that many qualify. The
  * compaction is an ordinary row-preserving commit (pinned readers,
  * the idempotent-append watermark, and the streaming offsets are all
  * untouched), so the ingest keeps flowing while the file count stays
  * bounded.
  */
private[streaming] class TxLogSink(table: String, appId: String,
    mode: OutputMode, partitionColumns: Seq[String] = Seq.empty,
    autoCompactMinFiles: Option[Int] = None,
    autoCompactSmallBytes: Long = 16L << 20,
    mergeKeys: Seq[String] = Seq.empty) extends Sink {

  private def checkLayout(spark: SparkSession): Unit =
    if (partitionColumns.nonEmpty &&
        TxLog.latestVersion(spark, table).isDefined) {
      val tablePb = TxLog.tablePartitionBy(spark, table)
      require(partitionColumns == tablePb,
        s"graft-txlog sink partitionBy [${partitionColumns.mkString(", ")}] " +
          s"does not match $table's layout [${tablePb.mkString(", ")}] — " +
          "appends inherit the table's partitioning")
    }

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the engine's micro-batch frame is isStreaming (blocks df.write);
    // re-wrap it as a batch frame — its plan still executes exactly once
    val batch = org.apache.spark.sql.graftshim.Shim.asBatch(data)
    if (mode == OutputMode.Complete()) {
      TxLog.overwrite(batch, table, partitionBy =
        Some(partitionColumns).filter(_.nonEmpty))
      ()
    } else if (mode == OutputMode.Update()) {
      // streaming UPSERT (the Delta merge-sink recipe, no foreachBatch
      // needed): each micro-batch MERGEs by `mergeKeys` with star
      // semantics — matched rows take every batch column, unmatched
      // insert — under the (appId, batchId) watermark, so the
      // at-least-once replay of a crashed batch commits NOTHING
      // (idempotent even though an upsert re-applied would not be).
      // DV / change-feed cost shapes follow the table's own
      // graft.dml.* properties, exactly like SQL DML.
      val spark = batch.sparkSession
      require(mergeKeys.nonEmpty,
        "graft-txlog sink in Update mode needs .option(\"mergeKeys\", \"k1,k2\")")
      mergeKeys.foreach(k => require(batch.columns.contains(k),
        s"mergeKeys column '$k' not in the stream (${batch.columns.mkString(", ")})"))
      if (TxLog.latestVersion(spark, table).isEmpty)
        TxLog.overwrite(batch.limit(0), table,
          partitionBy = Some(partitionColumns))
      val star = batch.columns.toSeq.map(c =>
        c -> org.apache.spark.sql.functions.expr(s"s.`$c`")).toMap
      val on = mergeKeys.map(k =>
        org.apache.spark.sql.functions.expr(s"t.`$k` <=> s.`$k`"))
        .reduce(_ && _)
      // a batch carrying several rows per key would make the merge fail
      // loudly (matched side) or double-insert (unmatched side): keep
      // ONE row per key. The pick is arbitrary WITHIN a batch — a
      // stream whose per-key order matters must pre-aggregate to final
      // state upstream (the documented Delta dedup-then-merge recipe);
      // replays can't diverge because the watermark skips them whole.
      val deduped = batch.dropDuplicates(mergeKeys)
      TxLog.mergeInto(spark, table, deduped, on,
        matched = Seq(TxLog.MergeUpdate(star)),
        notMatched = Seq(TxLog.MergeInsert(star)),
        deletionVectors = TxLog.dmlDeletionVectors(spark, table),
        changeFeed = TxLog.dmlChangeFeed(spark, table),
        txnAppId = Some(appId), txnBatchId = batchId)
      ()
    } else {
      checkLayout(batch.sparkSession)
      if (TxLog.latestVersion(batch.sparkSession, table).isEmpty)
        // create empty at the schema (and the requested layout)
        TxLog.overwrite(batch.limit(0), table,
          partitionBy = Some(partitionColumns))
      TxLog.idempotentAppend(batch, table, appId, batchId)
      autoCompactMinFiles.foreach { minFiles =>
        val spark = batch.sparkSession
        val m = TxLog.manifest(spark, table)
        val small = m.stats.getOrElse(Seq.empty)
          .count(_.bytes.exists(_ < autoCompactSmallBytes))
        if (small >= minFiles)
          TxLog.compact(spark, table,
            smallFileBytes = autoCompactSmallBytes,
            targetFileBytes = autoCompactSmallBytes.max(128L << 20))
      }
      ()
    }
  }

  override def toString: String = s"TxLogSink[$table]"
}

/** Version-number offset. The engine round-trips offsets through their
  * json form across restarts, so equality must be value-based.
  */
private[streaming] case class TxLogSourceOffset(version: Long) extends Offset {
  override def json: String = version.toString
}

private[streaming] object TxLogSourceOffset {
  /** Engine offsets arrive either as live [[TxLogSourceOffset]]s or as
    * checkpoint-recovered `SerializedOffset`s; the json value is the
    * one representation both share.
    */
  def versionOf(o: org.apache.spark.sql.connector.read.streaming.Offset): Long =
    o match {
      case TxLogSourceOffset(v) => v
      case other => other.json.trim.toLong
    }
}

/** `changeFeed = true` is the Delta CDF-streaming recipe: the initial
  * batch is the start snapshot AS inserts (`_change_type = "insert"`,
  * `_commit_version` = the snapshot version), every later batch is
  * [[graft.sources.TxLog.readChangeFeed]] over `(lastOffset, newOffset]`
  * — appends arrive as inserts from only their added files, recorded
  * DML as pre/post images, row-preserving maintenance commits
  * (compact, constraint changes) as nothing. A rewrite with no
  * recorded changes fails the stream loudly unless `ignoreChanges`.
  */
/** Opt-in schema-tracking restart (the Delta `schemaTrackingLocation`
  * surface): a stream carrying this option records the source schema
  * it serves under; when a restart finds the table evolved, an
  * ADDITIVE or WIDENING transition (every tracked column still present
  * under its name, same or widenable type) is AUTHORIZED — the tracked
  * record advances and the stream resumes under the new schema, with
  * pre-evolution history null-filling new columns and narrow files
  * promoting natively. Renames, drops, and narrowings still refuse
  * loudly (resuming through them silently re-shapes rows the stream
  * already promised; Delta gates those behind a further per-stream
  * opt-in) — a fresh checkpoint remains the remedy there. Without the
  * option, behavior is unchanged: any schema-changing version in range
  * fails the fixed-schema stream (the correct default).
  */
private[streaming] object SchemaTracking {
  private def file(loc: String) = new org.apache.hadoop.fs.Path(
    loc, "graft_source_schema.json")

  def advance(spark: SparkSession, loc: String, table: String,
      serving: StructType): Unit = {
    val p = file(loc)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val tracked: Option[StructType] =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val bytes = try {
          val out = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
          out.toByteArray
        } finally in.close()
        Some(org.apache.spark.sql.types.DataType
          .fromJson(new String(bytes, "UTF-8")).asInstanceOf[StructType])
      }
    tracked match {
      case Some(t) if t == serving => () // steady state: nothing to record
      case Some(t) =>
        val ok = t.fields.forall { tf =>
          serving.fields.find(_.name == tf.name).exists(sf =>
            sf.dataType == tf.dataType ||
              TxLog.canWiden(tf.dataType, sf.dataType))
        }
        if (!ok) sys.error(
          s"graft-txlog stream on $table: the tracked source schema at " +
            s"$loc cannot evolve into the table's current schema — a " +
            "column was renamed, dropped, or narrowed since the stream " +
            "last ran; resuming would silently re-shape already-promised " +
            "rows. Start from a fresh checkpoint to re-snapshot")
        write(fs, p, serving)
      case None => write(fs, p, serving)
    }
  }

  private def write(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, s: StructType): Unit = {
    val out = fs.create(p, true)
    try out.write(s.json.getBytes("UTF-8")) finally out.close()
  }
}

private[streaming] class TxLogSource(spark: SparkSession, table: String,
    override val schema: StructType, ignoreChanges: Boolean,
    changeFeed: Boolean = false,
    maxVersionsPerTrigger: Option[Long] = None,
    maxBytesPerTrigger: Option[Long] = None,
    maxFilesPerTrigger: Option[Long] = None,
    startingVersion: Option[Long] = None,
    schemaTracked: Boolean = false) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  /** Trigger.AvailableNow latch. Implementing the trait ourselves (the
    * DeltaSource recipe) keeps the engine consulting [[getOffset]] per
    * micro-batch until this target is reached — the default
    * AvailableNowSourceWrapper would freeze the FIRST (rate-capped)
    * offer as the terminal offset and stop a paced drain after one
    * batch.
    */
  private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit = synchronized {
    availableNowTarget = TxLog.latestVersion(spark, table)
  }

  /** Highest version this source has OFFERED or PROCESSED — what
    * `maxVersionsPerTrigger` advances from. Seeded by the engine's
    * recovery `getBatch` (the v1 contract replays the checkpointed
    * range through getBatch on restart, so a restarted capped stream
    * resumes pacing from its checkpoint, not from zero).
    */
  private var highWater: Option[Long] = startingVersion

  /** Rate-limited offer (the Delta `maxFilesPerTrigger` /
    * `maxBytesPerTrigger` idea at this log's granularity): never offer
    * more than `maxVersionsPerTrigger` versions — nor, past the first
    * admitted version, more than `maxBytesPerTrigger` of ADDED data
    * bytes (a soft cap, so one oversized commit still drains) — beyond
    * the last offered/processed point. A deep backlog (or a multi-day
    * catch-up on a 100 TB table) drains as bounded micro-batches
    * instead of one giant one. Uncapped sources keep the plain
    * latest-version offer.
    */
  private def offer(startV: Option[Long]): Option[Long] = synchronized {
    TxLog.latestVersion(spark, table).map { live =>
      // AvailableNow processes what existed at query start — later
      // commits wait for the next run
      val latest = availableNowTarget.fold(live)(math.min(live, _))
      // pacing base: the engine-supplied committed offset when the
      // admission-control path provides one (restart-correct), else the
      // tracked high-water, else startingVersion (fresh capped stream)
      val base = startV.orElse(highWater).orElse(startingVersion)
      val capped = base match {
        case Some(b) if maxVersionsPerTrigger.isDefined ||
            maxBytesPerTrigger.isDefined ||
            maxFilesPerTrigger.isDefined => paceFrom(b, latest)
        case _ => latest
      }
      highWater = Some(highWater.fold(capped)(math.max(_, capped)))
      capped
    }
  }

  /** Admit versions from `b` (exclusive) toward `latest` while the
    * caps allow: the version cap is hard; the byte and file caps are
    * soft — a version is admitted while its budget is not yet
    * exhausted and at least one always is, so the stream can never
    * stall on one big commit. Added-work walking is metadata-only
    * (manifest file diffs, resolver-cached) and only runs when a
    * byte/file cap is set.
    */
  private def paceFrom(b: Long, latest: Long): Long = {
    var v = b
    var n = 0L
    var bytes = 0L
    var files = 0L
    while (v < latest && maxVersionsPerTrigger.forall(n < _) &&
        (n == 0L || (maxBytesPerTrigger.forall(bytes < _) &&
          maxFilesPerTrigger.forall(files < _)))) {
      v += 1; n += 1
      if (maxBytesPerTrigger.isDefined || maxFilesPerTrigger.isDefined) {
        val (nf, nb) = addedAt(v)
        files += nf; bytes += nb
      }
    }
    v
  }

  /** (file count, on-disk bytes) version `v`'s commit ADDED (manifest
    * diffs vs `v − 1`); files without a recorded size count 0 bytes —
    * pacing is advisory, correctness never depends on it.
    */
  private def addedAt(v: Long): (Long, Long) = {
    val prev =
      if (v <= 1L) Set.empty[String]
      else TxLog.filesAt(spark, table, v - 1).toSet
    val m = TxLog.manifestAt(spark, table, v)
    val sizes = m.stats.getOrElse(Seq.empty).map(e => e.path -> e.bytes).toMap
    val added = m.files.filterNot(prev)
    (added.size.toLong,
      added.map(f => sizes.get(f).flatten.getOrElse(0L)).sum)
  }

  override def getOffset: Option[Offset] =
    offer(None).map(TxLogSourceOffset(_))

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  /** Admission-control offer (the path the engine uses once the source
    * declares SupportsAdmissionControl): same pacing as [[getOffset]],
    * with the engine's committed `start` as the restart-correct base.
    */
  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset =
    offer(Option(start).map(TxLogSourceOffset.versionOf))
      .map(TxLogSourceOffset(_)).orNull

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val endV = TxLogSourceOffset.versionOf(end)
    synchronized {
      highWater = Some(highWater.fold(endV)(math.max(_, endV)))
    }
    start.map(TxLogSourceOffset.versionOf)
        .orElse(startingVersion) match {
      // startingVersion at/past the offered end: nothing yet (and never
      // a snapshot — startingVersion means "changes after v" by contract)
      case Some(startV) if startV >= endV =>
        withSchema(spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema))
      case None if changeFeed =>
        withSchema(TxLog.readAsOf(spark, table, endV)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(endV)))
      case None =>
        // initial load: the full snapshot as committed at the start
        // version, planned from its manifest file list
        withSchema(TxLog.readAsOf(spark, table, endV))
      case Some(startV) if changeFeed =>
        // the batch feed handles schema-changing versions (each reads
        // under its own schema), but THIS stream's schema is fixed at
        // start — fail loudly rather than null-fill through the rename
        // or cast a widened column back down
        if (!ignoreChanges) ((startV + 1) to endV).foreach { v =>
          val a = TxLog.manifestAt(spark, table, v).action
          if (TxLog.schemaChangingActions(a) && !trackedOk(v)) sys.error(
            s"graft-txlog CDF stream on $table: version $v is '$a' — the " +
              "table's schema changed under a stream whose schema is fixed " +
              "at start; restart from a fresh checkpoint to pick up the " +
              "new schema (or resume with schemaTrackingLocation if the " +
              "change was additive)")
        }
        withSchema(TxLog.readChangeFeed(spark, table, startV, Some(endV),
          skipUnrecorded = ignoreChanges))
      case Some(startV) =>
        val newFiles = appendedFiles(startV, endV)
        withSchema(TxLog.readFiles(spark, table, newFiles))
    }
  }

  /** Files added by the append commits in `(startV, endV]`. Walks the
    * per-version manifests so each file is attributed to the commit
    * that introduced it — a plain endpoints diff could not tell an
    * appended file from a compaction rewrite.
    */
  private def appendedFiles(startV: Long, endV: Long): Seq[String] = {
    var prev = TxLog.filesAt(spark, table, startV).toSet
    val out = Seq.newBuilder[String]
    ((startV + 1) to endV).foreach { v =>
      val m = TxLog.manifestAt(spark, table, v)
      val cur = m.files.toSet
      if (m.action == "append") out ++= m.files.filterNot(prev)
      // row-preserving commits (OPTIMIZE, REORG PURGE, metadata-only
      // DDL — Delta's dataChange=false class) emit nothing and need no
      // escape hatch: a nightly compaction must never kill the stream.
      // Schema-CHANGING metadata commits still fail it loudly — the
      // stream's schema is fixed at start, and silently re-selecting
      // through it would null-fill a renamed/dropped name or cast a
      // widened column back down
      else if (TxLog.schemaChangingActions(m.action) && !ignoreChanges &&
          !trackedOk(v))
        sys.error(
          s"graft-txlog stream on $table: version $v is '${m.action}' — " +
            "the table's schema changed under a stream whose schema is " +
            "fixed at start; restart from a fresh checkpoint to pick up " +
            "the new schema, resume with schemaTrackingLocation if the " +
            "change was additive, or .option(\"ignoreChanges\", \"true\") " +
            "to project through the old one")
      else if (!TxLog.rowPreservingActions(m.action) && !ignoreChanges)
        sys.error(
          s"graft-txlog stream on $table: version $v is '${m.action}', not " +
            "an append - its rewrites would re-emit old rows as phantom " +
            "inserts; restart from a fresh checkpoint to re-snapshot, or " +
            "set .option(\"ignoreChanges\", \"true\") to skip them")
      prev = cur
    }
    out.result()
  }

  /** With schema tracking on: is version `v`'s schema change one the
    * SERVING schema subsumes? Every column of the schema AT v must be
    * present under its own name with a same-or-widenable type — then
    * rows of every in-range version align exactly through
    * [[withSchema]] (old files null-fill added columns, narrow
    * physical pages promote natively). A change the serving schema
    * cannot subsume (a mid-run rename/drop, or a widen the restart has
    * not yet observed) still fails loudly — the restart path is where
    * tracking advances.
    */
  private def trackedOk(v: Long): Boolean = schemaTracked && {
    val at = TxLog.logicalSchemaAt(spark, table, v)
    at.fields.forall { f =>
      schema.fields.find(_.name == f.name).exists(sf =>
        sf.dataType == f.dataType || TxLog.canWiden(f.dataType, sf.dataType))
    }
  }

  /** The stream's schema is fixed at start; an evolved table's new
    * columns are projected away (and files predating a column
    * null-fill it) by re-selecting through the fixed schema. The result
    * is re-wrapped with `isStreaming = true` — the engine asserts it on
    * every frame `getBatch` returns.
    */
  private def withSchema(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val have = df.columns.toSet
    org.apache.spark.sql.graftshim.Shim.asStreaming(
      df.select(schema.fields.toSeq.map { f =>
        if (have.contains(f.name)) col(f.name).cast(f.dataType)
        else lit(null).cast(f.dataType).as(f.name)
      }: _*))
  }

  override def commit(end: Offset): Unit = () // retention is vacuum's job

  override def stop(): Unit = ()
}
