package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression, InSubquery, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.graftshim.Shim

import graft.sources.{TxLog, TxLogRelation}

/** SQL DML for graft-txlog tables — makes
  *
  * {{{
  *   sql("DELETE FROM t WHERE …")
  *   sql("UPDATE t SET c = e, … WHERE …")
  *   sql("MERGE INTO t USING src s ON … WHEN MATCHED [AND …] THEN
  *        UPDATE SET … / DELETE  WHEN NOT MATCHED [AND …] THEN INSERT …
  *        WHEN NOT MATCHED BY SOURCE [AND …] THEN UPDATE … / DELETE")
  * }}}
  *
  * reach the SAME transactional implementations the Scala API uses
  * ([[TxLog.delete]] / [[TxLog.update]] / [[TxLog.mergeInto]]) — SQL
  * adds a parser, not a second engine, so the SQL surface can never
  * drift from the operator semantics (optimistic CAS, deletion-vector
  * opt-in via table property, CHECK constraints, generated columns).
  *
  * Mechanism: Spark's own parser + analyzer already produce fully
  * RESOLVED `DeleteFromTable` / `UpdateTable` / `MergeIntoTable` plans
  * over a v1 relation (verified on 4.1: analysis passes; only PLANNING
  * rejects v1 targets), so this strategy intercepts exactly where the
  * built-in planner would throw "only supported with v2 tables".
  * Expressions are de-resolved back to name-based references (the
  * TxLog APIs re-resolve them against their own scan plans) — target
  * attributes to `t.<name>`, source attributes to `s.<name>`, matching
  * [[TxLog.mergeInto]]'s aliasing contract.
  *
  * Deletion vectors: SQL carries no option syntax here, so the path is
  * chosen by the table property [[TxLog.dvPropertyKey]] (set via
  * `TxLog.setProperty(…, TxLog.dvPropertyKey, "true")`) — the
  * Delta-parity knob a table declares once rather than per statement.
  * The change data feed works the same way: [[TxLog.cfPropertyKey]]
  * makes every SQL DML statement record its row-level changes, so
  * `readChangeFeed`/`graft_tx_cdf` work across SQL commits.
  */
object TxSqlDmlStrategy extends SparkStrategy {

  /** Unwraps alias/projection shells down to a graft-txlog relation.
    * (The optimizer usually eliminates SubqueryAlias before planning,
    * but commands may reach the planner un-optimized too.)
    */
  private object TxTarget {
    def unapply(plan: LogicalPlan): Option[(TxLogRelation, Seq[Attribute])] =
      plan match {
        case SubqueryAlias(_, child) => unapply(child)
        case lr: LogicalRelation if lr.relation.isInstanceOf[TxLogRelation] =>
          Some((lr.relation.asInstanceOf[TxLogRelation], lr.output))
        case _ => None
      }
  }

  /** The catalog identifier a DML target was resolved through — the
    * LogicalRelation's CatalogTable (alias shells may or may not have
    * been eliminated by the time the planner runs, so don't rely on
    * SubqueryAlias). None for path-registered temp views and the like.
    */
  private def identOf(plan: LogicalPlan)
      : Option[org.apache.spark.sql.catalyst.TableIdentifier] = plan match {
    case SubqueryAlias(_, child) => identOf(child)
    case lr: LogicalRelation => lr.catalogTable.map(_.identifier)
    case _ => None
  }

  private def requireWritable(rel: TxLogRelation): String = {
    require(!rel.isTimeTravel,
      "graft-txlog: cannot run DML through a versionAsOf time-travel " +
        "relation - it is a read-only historical view")
    rel.tablePath
  }

  /** Values a DML predicate may pull in through an IN (SELECT …) before
    * the materialization fails loudly: the list is evaluated on the
    * driver and shipped like a broadcast, so it must stay
    * broadcast-sized. A genuinely large key set is a MERGE's job.
    */
  private val maxSubqueryRows = 1000000

  /** Materialize UNCORRELATED subqueries in a DML predicate: the plan
    * arrives analyzed, so each subquery is already a resolved plan —
    * execute it once and substitute the result (a literal for scalar
    * subqueries and EXISTS, an IN-list for IN (SELECT …)), exactly the
    * decorrelation-free cases. Correlated subqueries (outer references
    * into the target row) would need a join rewrite — those still fail
    * loudly below rather than mis-evaluate.
    */
  private def materializeSubqueries(e: Expression): Expression = {
    lazy val spark = SparkSession.active
    e.transform {
      case s: org.apache.spark.sql.catalyst.expressions.ScalarSubquery
          if s.outerAttrs.isEmpty =>
        val rows = Shim.ofRows(spark, s.plan).limit(2).collect()
        require(rows.length <= 1,
          "graft-txlog SQL DML: scalar subquery returned more than one row")
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          if (rows.isEmpty) null else rows.head.get(0), s.dataType)
      case InSubquery(values, lq) if lq.outerAttrs.isEmpty =>
        require(values.length == 1, "graft-txlog SQL DML: multi-column " +
          "IN (SELECT …) predicates are not supported - concatenate the " +
          "key columns or use MERGE")
        val rows = Shim.ofRows(spark, lq.plan).limit(maxSubqueryRows + 1).collect()
        require(rows.length <= maxSubqueryRows,
          s"graft-txlog SQL DML: IN (SELECT …) materialized more than " +
            s"$maxSubqueryRows values - a key set this large should drive " +
            "a MERGE, not a driver-side IN-list")
        val dt = lq.plan.output.head.dataType
        val lits = rows.toSeq.map(r =>
          org.apache.spark.sql.catalyst.expressions.Literal.create(r.get(0), dt))
        if (lits.isEmpty)
          org.apache.spark.sql.catalyst.expressions.Literal.FalseLiteral
        else org.apache.spark.sql.catalyst.expressions.In(values.head, lits)
      case ex: org.apache.spark.sql.catalyst.expressions.Exists
          if ex.outerAttrs.isEmpty =>
        org.apache.spark.sql.catalyst.expressions.Literal(
          !Shim.ofRows(spark, ex.plan).limit(1).isEmpty)
    }
  }

  /** Resolved attribute refs → name-based refs the TxLog APIs re-resolve
    * against their own scans. Uncorrelated subqueries are materialized
    * first ([[materializeSubqueries]]); a surviving (correlated) one is
    * not routable through the Column-based APIs — fail loudly rather
    * than mis-evaluate.
    */
  private def unresolve(e: Expression, tAttrs: AttributeSet,
      sAttrs: AttributeSet): Expression = {
    val m = materializeSubqueries(e)
    require(!m.exists(_.isInstanceOf[SubqueryExpression]),
      "graft-txlog SQL DML: correlated subqueries in DML predicates are " +
        "not supported - rewrite as MERGE (uncorrelated ones materialize " +
        "automatically)")
    m.transform {
      case a: AttributeReference if tAttrs.contains(a) =>
        UnresolvedAttribute(Seq("t", a.name))
      case a: AttributeReference if sAttrs.contains(a) =>
        UnresolvedAttribute(Seq("s", a.name))
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    }
  }

  private def colOf(e: Expression, tAttrs: AttributeSet = AttributeSet.empty,
      sAttrs: AttributeSet = AttributeSet.empty): Column =
    Shim.column(unresolve(e, tAttrs, sAttrs))

  private def nameOf(e: Expression): String = e match {
    case a: AttributeReference => a.name
    case u: UnresolvedAttribute => u.nameParts.last
    case other => sys.error(
      s"graft-txlog SQL DML: cannot assign to expression ${other.sql}")
  }

  /** The table root of a session-catalog graft-txlog table, or None for
    * anything else (other providers, temp views, missing tables) — the
    * guard that keeps the DDL interceptions below scoped to ours.
    */
  private[plans] def txTableOf(
      ident: org.apache.spark.sql.catalyst.TableIdentifier): Option[String] = {
    val spark = SparkSession.active
    val cat = spark.sessionState.catalog
    if (!cat.tableExists(ident)) None
    else {
      val meta = cat.getTableMetadata(ident)
      if (meta.provider.exists(_.equalsIgnoreCase("graft-txlog")))
        meta.storage.properties.get("path")
          .orElse(meta.storage.locationUri.map(_.toString))
      else None
    }
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    // maintenance/DDL statements parsed by GraftSqlParser (OPTIMIZE /
    // VACUUM / RESTORE / ALTER TABLE DROP|RENAME COLUMN)
    case g: GraftMaintenance =>
      TxCommandExec(g.label, g.output, g.run) :: Nil

    // ALTER TABLE … ADD COLUMN(S): Spark's analyzer resolves this to
    // the v1 catalog command, which would widen only the METASTORE
    // schema (our manifests never read it — silent divergence); route
    // it into the transactional metadata-only schema commit instead.
    case c: org.apache.spark.sql.execution.command.AlterTableAddColumnsCommand
        if txTableOf(c.table).isDefined =>
      val path = txTableOf(c.table).get
      TxDmlExec("graft_tx_add_columns", plan.output, { spark =>
        TxLog.addColumns(spark, path, c.colsToAdd)
        GraftSqlParser.syncCatalog(spark, Some(c.table), path)
      }) :: Nil
    // ALTER TABLE … SET/UNSET TBLPROPERTIES: the analyzer resolves these
    // to v1 catalog commands (which would write METASTORE metadata our
    // manifests never read — silent divergence); reroute them into the
    // transactional property commits, keeping the manifest the single
    // source of truth (read back via graft_tx_properties)
    case c: org.apache.spark.sql.execution.command.AlterTableSetPropertiesCommand
        if !c.isView && txTableOf(c.tableName).isDefined =>
      val path = txTableOf(c.tableName).get
      TxDmlExec("graft_tx_set_properties", plan.output, { spark =>
        c.properties.toSeq.sortBy(_._1).foreach { case (k, v) =>
          TxLog.setProperty(spark, path, k, v) }
      }) :: Nil

    case c: org.apache.spark.sql.execution.command.AlterTableUnsetPropertiesCommand
        if !c.isView && txTableOf(c.tableName).isDefined =>
      val path = txTableOf(c.tableName).get
      TxDmlExec("graft_tx_unset_properties", plan.output, { spark =>
        c.propKeys.sorted.foreach(k => TxLog.unsetProperty(spark, path, k))
      }) :: Nil

    // SHOW TBLPROPERTIES: the native exec reads the METASTORE, which
    // the SET/UNSET interceptions above deliberately bypass — answer
    // from the manifest instead so the standard read surface agrees
    // with graft_tx_properties (the manifest is the single source of
    // truth for transactional table metadata). Spark 4 analyzes this to
    // the v2 ShowTableProperties over a ResolvedTable even for v1
    // session-catalog tables.
    case s: ShowTableProperties =>
      val ident = s.table match {
        case rt: org.apache.spark.sql.catalyst.analysis.ResolvedTable =>
          Some(org.apache.spark.sql.catalyst.TableIdentifier(
            rt.identifier.name, rt.identifier.namespace.lastOption))
        case _ => None
      }
      ident.flatMap(txTableOf) match {
        case Some(path) =>
          TxRowsExec("graft_tx_show_properties", s.output, { spark =>
            val props = TxLog.propertiesOf(spark, path)
            s.propertyKey match {
              case Some(k) =>
                val v = props.getOrElse(k,
                  s"Table ${ident.get.identifier} does not have property: $k")
                // the analyzer decides the lookup form's arity
                if (s.output.size == 1) Seq(Seq(v)) else Seq(Seq(k, v))
              case None => props.toSeq.sorted.map { case (k, v) => Seq(k, v) }
            }
          }) :: Nil
        case None => Nil
      }

    case DeleteFromTable(TxTarget(rel, _), cond) =>
      val path = requireWritable(rel)
      TxDmlExec("graft_tx_delete", plan.output, { spark =>
        TxLog.delete(spark, path, colOf(cond),
          changeFeed = TxLog.dmlChangeFeed(spark, path),
          deletionVectors = TxLog.dmlDeletionVectors(spark, path))
        rel.unpin()
      }) :: Nil

    case UpdateTable(TxTarget(rel, _), assignments, cond) =>
      val path = requireWritable(rel)
      val set = assignments.map(a => nameOf(a.key) -> colOf(a.value))
      val c = cond.map(colOf(_)).getOrElse(Shim.column(
        org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral))
      TxDmlExec("graft_tx_update", plan.output, { spark =>
        TxLog.update(spark, path, c, set,
          changeFeed = TxLog.dmlChangeFeed(spark, path),
          deletionVectors = TxLog.dmlDeletionVectors(spark, path))
        rel.unpin()
      }) :: Nil

    case mit: MergeIntoTable => mit.targetTable match {
      case TxTarget(rel, tOut) =>
        val path = requireWritable(rel)
        val tAttrs = AttributeSet(tOut)
        val sAttrs = mit.sourceTable.outputSet
        def cl(c: Option[Expression]): Option[Column] =
          c.map(colOf(_, tAttrs, sAttrs))
        // SET * / INSERT * expand to every target column taking the
        // same-named source column (the ANSI star contract). WITH
        // SCHEMA EVOLUTION: the analyzer has ALREADY expanded the stars
        // against the TARGET schema (silently dropping source-only
        // columns) before this strategy runs, so star-ness is
        // unrecoverable from the action node — it is recovered by
        // SHAPE: an expanded star assigns EVERY target column from its
        // same-named source attribute, and only such clauses get the
        // source-only columns appended. An explicit partial clause
        // (`UPDATE SET bal = s.bal`) keeps exactly its assigned set —
        // Delta's star-only evolution contract (README): evolution
        // never writes a column the clause didn't (star-)reference.
        // An EXPLICIT assignment to a brand-new column cannot reach
        // this strategy at all (the analyzer rejects the unresolvable
        // target reference).
        val evolvedExtra: Seq[String] =
          if (!mit.withSchemaEvolution) Seq.empty
          else mit.sourceTable.output.map(_.name).filterNot(n =>
            rel.schema.fieldNames.exists(_.equalsIgnoreCase(n)))
        def sCol(n: String): Column =
          Shim.column(UnresolvedAttribute(Seq("s", n)))
        def withEvo(set: Map[String, Column]): Map[String, Column] =
          set ++ evolvedExtra.map(n => n -> sCol(n))
        def starSet: Map[String, Column] =
          withEvo(rel.schema.fieldNames.toSeq.map(n => n -> sCol(n)).toMap)
        def setOf(as: Seq[Assignment]): Map[String, Column] =
          as.map(a => nameOf(a.key) -> colOf(a.value, tAttrs, sAttrs)).toMap
        def srcAttrName(e: Expression): Option[String] = e match {
          case ar: AttributeReference if sAttrs.contains(ar) => Some(ar.name)
          case c: org.apache.spark.sql.catalyst.expressions.Cast =>
            srcAttrName(c.child)
          case a: org.apache.spark.sql.catalyst.expressions.Alias =>
            srcAttrName(a.child)
          case _ => None
        }
        def isStarShape(as: Seq[Assignment]): Boolean =
          as.map(a => nameOf(a.key).toLowerCase).toSet ==
            rel.schema.fieldNames.map(_.toLowerCase).toSet &&
          as.forall(a => srcAttrName(a.value)
            .exists(_.equalsIgnoreCase(nameOf(a.key))))
        def evoSet(as: Seq[Assignment]): Map[String, Column] = {
          val s0 = setOf(as)
          if (isStarShape(as)) withEvo(s0) else s0
        }
        val matched = mit.matchedActions.map {
          case UpdateAction(c, as, _) => TxLog.MergeUpdate(evoSet(as), cl(c))
          case UpdateStarAction(c) => TxLog.MergeUpdate(starSet, cl(c))
          case DeleteAction(c) => TxLog.MergeDelete(cl(c))
          case other => sys.error(s"graft-txlog MERGE: unsupported matched action $other")
        }
        val notMatched = mit.notMatchedActions.map {
          case InsertAction(c, as) => TxLog.MergeInsert(evoSet(as), cl(c))
          case InsertStarAction(c) => TxLog.MergeInsert(starSet, cl(c))
          case other => sys.error(s"graft-txlog MERGE: unsupported not-matched action $other")
        }
        val bySource = mit.notMatchedBySourceActions.map {
          case UpdateAction(c, as, _) => TxLog.MergeUpdate(setOf(as), cl(c))
          case DeleteAction(c) => TxLog.MergeDelete(cl(c))
          case other => sys.error(
            s"graft-txlog MERGE: unsupported not-matched-by-source action $other")
        }
        val on = colOf(mit.mergeCondition, tAttrs, sAttrs)
        val src = mit.sourceTable
        TxDmlExec("graft_tx_merge", plan.output, { spark =>
          TxLog.mergeInto(spark, path, Shim.ofRows(spark, src), on,
            matched, notMatched, bySource,
            deletionVectors = TxLog.dmlDeletionVectors(spark, path),
            changeFeed = TxLog.dmlChangeFeed(spark, path),
            evolveSchema = mit.withSchemaEvolution)
          // evolution widened the manifest schema; write it through to
          // the session catalog like the DDL interceptions do, or the
          // catalog relation's stored schema would reject the table
          if (mit.withSchemaEvolution)
            GraftSqlParser.syncCatalog(spark, identOf(mit.targetTable), path)
          rel.unpin()
        }) :: Nil
      case _ => Nil
    }

    case _ => Nil
  }
}

/** Side-effecting DML exec node: runs the transactional operation once
  * (idempotently guarded — Spark may invoke executeCollect and doExecute
  * more than once on a command's physical plan) and returns no rows,
  * matching the logical Command's empty output.
  */
/** Row-RETURNING metadata exec (SHOW TBLPROPERTIES and friends): the
  * body is a pure read of transactional metadata, so no run-once guard
  * is needed; all output columns are strings by the commands' contract.
  */
case class TxRowsExec(label: String, output: Seq[Attribute],
    body: SparkSession => Seq[Seq[String]]) extends LeafExecNode {
  override def executeCollect(): Array[InternalRow] =
    body(SparkSession.active).map(r => InternalRow.fromSeq(
      r.map(org.apache.spark.unsafe.types.UTF8String.fromString))).toArray
  override protected def doExecute(): RDD[InternalRow] =
    sparkContext.parallelize(executeCollect().toSeq, 1)
  override def nodeName: String = label
}

case class TxDmlExec(label: String, output: Seq[Attribute],
    body: SparkSession => Unit) extends LeafExecNode {
  private val ran = new java.util.concurrent.atomic.AtomicBoolean(false)
  private def runOnce(): Unit =
    if (ran.compareAndSet(false, true)) body(SparkSession.active)
  override def executeCollect(): Array[InternalRow] = {
    runOnce(); Array.empty
  }
  override protected def doExecute(): RDD[InternalRow] = {
    runOnce(); sparkContext.emptyRDD
  }
  override def nodeName: String = label
}
