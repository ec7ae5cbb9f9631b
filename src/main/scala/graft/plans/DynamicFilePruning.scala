package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression, In, InSubquery, IsNotNull, ListQuery, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LocalRelation, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.graftshim.Shim

import graft.sources.TxLogRelation

/** Dynamic file pruning for `graft-txlog` fact scans — the Delta DFP
  * move re-expressed for a v1 relation: under an equi-join whose OTHER
  * side is a small, filtered dimension (it would broadcast anyway),
  * the dimension's distinct join-key values are collected at PLANNING
  * time and replayed onto the fact side as an `IN` filter placed
  * directly above the fact's [[LogicalRelation]]. From there the
  * EXISTING static machinery does the work: `TxLogRelation.buildScan`
  * prunes the manifest's file list through per-file min/max stats and
  * bloom sidecars, and the parquet reader gets the IN for row-group
  * skipping. On the star shapes this engine targets (orders filtered
  * by priority joining a date-clustered 100 TB lineitem), this is the
  * difference between scanning the table and scanning the qualifying
  * slice — a static `WHERE` can never express it because the key set
  * only exists after the dimension's own filter runs.
  *
  * Eligibility is deliberately conservative — the rewrite must never
  * lose rows or explode planning cost:
  *  - Inner joins prune either side; LEFT SEMI prunes the left
  *    (probe) side. Outer joins never prune the preserved side and are
  *    skipped entirely.
  *  - the dimension subtree must carry a `Filter` (the selectivity
  *    signal — an unfiltered dim usually references every fact key) or
  *    be a `LocalRelation` (an inline lookup list), and its estimated
  *    size must fit the auto-broadcast threshold: the collect is then
  *    bounded by construction, the dim was getting materialized on the
  *    driver for the broadcast anyway.
  *  - the fact-side join key must be a bare output attribute of a
  *    graft-txlog `LogicalRelation` reachable through Project/Filter
  *    shells only — the injected filter lands where
  *    `PhysicalOperation` collects scan filters.
  *  - the distinct key set is capped (`spark.graft.dynamicFilePruning
  *    .maxKeys`, default 1000): one row past the cap and the rewrite
  *    backs off, because an INCOMPLETE key list would wrongly drop
  *    fact rows. NULL keys are dropped — an equi-join never matches
  *    them.
  *
  * Runs as a PRE-CBO rule (a Once batch after the operator-optimization
  * fixed point): executing the dim subplan inside a fixed-point batch
  * would re-fire on every iteration, and the injected filter needs no
  * further optimization — it is born fully pushed. The dimension
  * executes one extra time (once here, once in the join); that is the
  * same trade Delta's DFP makes, bounded by the broadcast threshold.
  * Disable with `spark.graft.dynamicFilePruning = false`.
  */
object DynamicFilePruning extends Rule[LogicalPlan] with PredicateHelper {

  /** Test observability: injected key count of the last rewrite this
    * rule performed (−1 = never; the value is per-JVM, specs reset it).
    */
  @volatile private[graft] var lastInjectedKeys: Int = -1

  private def enabled: Boolean =
    conf.getConfString("spark.graft.dynamicFilePruning", "true").toBoolean

  private def maxKeys: Int =
    conf.getConfString("spark.graft.dynamicFilePruning.maxKeys", "1000").toInt

  private def dimLimitBytes: Long = {
    val t = conf.autoBroadcastJoinThreshold
    if (t > 0) t else 10L << 20
  }

  /** Selectivity signal: the dim subtree filters on something REAL, or
    * IS an inline lookup list. A bare `IsNotNull` doesn't count —
    * InferFiltersFromConstraints stamps one on every equi-join side,
    * so it signals nothing about selectivity.
    */
  private def filteredDim(p: LogicalPlan): Boolean =
    p.collectFirst {
      case f: Filter if splitConjunctivePredicates(f.condition).exists {
        case IsNotNull(_) => false
        case _ => true
      } => f
      case l: LocalRelation => l
    }.isDefined

  /** Inject `cond` directly above the fact's graft-txlog relation —
    * but only if `key` survives untouched to that depth (bare output
    * attribute; Project/Filter/alias shells only). None = not a shape
    * we prune.
    */
  private def injectAtRelation(p: LogicalPlan, key: Attribute,
      cond: Expression): Option[LogicalPlan] = p match {
    case lr: LogicalRelation
        if lr.relation.isInstanceOf[TxLogRelation] &&
           lr.outputSet.contains(key) =>
      Some(Filter(cond, lr))
    case f: Filter =>
      injectAtRelation(f.child, key, cond).map(c => f.copy(child = c))
    case pr: Project =>
      injectAtRelation(pr.child, key, cond).map(c => pr.copy(child = c))
    case a: SubqueryAlias =>
      injectAtRelation(a.child, key, cond).map(c => a.copy(child = c))
    case _ => None
  }

  /** Collect the dim side's distinct non-null keys; None = over the
    * cap (an incomplete list must not prune) or the collect failed
    * (planning must never die for an optimization).
    */
  private def dimKeys(dim: LogicalPlan, key: Attribute): Option[Seq[Any]] =
    try {
      val rows = Shim.ofRows(SparkSession.active, Project(Seq(key), dim))
        .distinct().limit(maxKeys + 1).collect()
      if (rows.length > maxKeys) None
      else Some(rows.toSeq.map(_.get(0)).filter(_ != null))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Structural pre-check (no execution): is `key` a bare output
    * attribute of a graft-txlog relation under Project/Filter shells?
    * Everything else in [[prune]] runs a job — this must gate it, so
    * non-txlog joins never pay a planning-time collect.
    */
  private def prunableAt(p: LogicalPlan, key: Attribute): Boolean = p match {
    case lr: LogicalRelation =>
      lr.relation.isInstanceOf[TxLogRelation] && lr.outputSet.contains(key)
    case f: Filter => prunableAt(f.child, key)
    case pr: Project => prunableAt(pr.child, key)
    case a: SubqueryAlias => prunableAt(a.child, key)
    case _ => false
  }

  /** The shared core: gate, collect the dim keys, inject the IN above
    * the fact's relation. None = ineligible or backed off.
    */
  private def injectedFact(fact: LogicalPlan, factKey: Attribute,
      dim: LogicalPlan, dimKey: Attribute): Option[LogicalPlan] = {
    if (!prunableAt(fact, factKey)) return None
    if (!filteredDim(dim)) return None
    if (factKey.dataType != dimKey.dataType) return None
    // the dim executes TWICE (key collect here, the join at runtime):
    // a non-deterministic dim (rand() filter, shuffling sample) could
    // produce a key set that disagrees with its join-time rows and the
    // injected IN would wrongly drop matching fact rows — never prune
    if (dim.exists(_.expressions.exists(e =>
        !e.deterministic || e.exists(!_.deterministic)))) return None
    if (dim.stats.sizeInBytes > dimLimitBytes) return None
    dimKeys(dim, dimKey).flatMap { keys =>
      val cond: Expression =
        if (keys.isEmpty) Literal.FalseLiteral // equi-match is empty
        else In(factKey, keys.map(v => Literal.create(v, factKey.dataType)))
      injectAtRelation(fact, factKey, cond)
        .map { nf => lastInjectedKeys = keys.size; nf }
    }
  }

  private def prune(j: Join, fact: LogicalPlan, factKey: Attribute,
      dim: LogicalPlan, dimKey: Attribute, factIsLeft: Boolean)
      : Option[Join] =
    injectedFact(fact, factKey, dim, dimKey).map { newFact =>
      if (factIsLeft) j.copy(left = newFact) else j.copy(right = newFact)
    }

  def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled || plan.isStreaming) return plan
    plan.transformUp {
      case j @ Join(left, right, jt, Some(cond), _)
          if (jt == Inner || jt == LeftSemi) && !j.isStreaming =>
        val eqs = splitConjunctivePredicates(cond).collect {
          case EqualTo(a: Attribute, b: Attribute) => (a, b)
        }
        val candidates = eqs.iterator.flatMap { case (a, b) =>
          // orient each equi pair to (leftAttr, rightAttr)
          val lr =
            if (left.outputSet.contains(a) && right.outputSet.contains(b))
              Some((a, b))
            else if (left.outputSet.contains(b) && right.outputSet.contains(a))
              Some((b, a))
            else None
          lr.iterator.flatMap { case (la, ra) =>
            // left as fact (Inner and LeftSemi both drop non-matching
            // left rows); right as fact only for Inner — lazily, so a
            // successful left rewrite never pays a second collect
            def leftFact = prune(j, left, la, right, ra, factIsLeft = true)
            def rightFact =
              if (jt == Inner) prune(j, right, ra, left, la, factIsLeft = false)
              else None
            leftFact.orElse(rightFact).iterator
          }
        }
        if (candidates.hasNext) candidates.next() else j

      // `k IN (SELECT …)`: at pre-CBO time the semi join doesn't exist
      // yet (RewritePredicateSubquery runs later) — prune from the
      // still-inline ListQuery. Uncorrelated single-column lists only;
      // NOT IN arrives as Not(InSubquery) and never matches here.
      case f @ Filter(cond, child) =>
        val injected = splitConjunctivePredicates(cond).iterator.flatMap {
          case InSubquery(Seq(a: Attribute), lq: ListQuery)
              if lq.outerAttrs.isEmpty && lq.plan.output.size == 1 =>
            injectedFact(child, a, lq.plan, lq.plan.output.head).iterator
          case _ => Iterator.empty
        }
        if (injected.hasNext) f.copy(child = injected.next()) else f
    }
  }
}
