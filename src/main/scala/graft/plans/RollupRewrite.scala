package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter => FilterNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DataType

/**
 * Aggregate navigation — answer a base-table aggregation from a
 * materialized rollup. The 100 TB shape this buys: a reporting query
 * that would rescan 10¹¹ lineitem rows instead reads a
 * |group-domain|-row parquet and re-aggregates, because SUM/COUNT/
 * MIN/MAX are re-aggregable from partials (sum of sums, sum of counts,
 * min of mins). The classic warehouse "materialized view matching"
 * optimization, expressed as a Catalyst [[Rule]] so USER QUERIES DON'T
 * CHANGE — the query still names the base table; the optimizer swaps
 * the scan.
 *
 * Scope (matching is deliberately conservative — when in doubt, leave
 * the plan alone; the rewrite must never change semantics):
 *
 *  - the Aggregate's child is the registered base relation (optionally
 *    through a column-pruning Project of bare attributes, optionally
 *    through ONE deterministic Filter whose every column is a rollup
 *    KEY — key columns are group-constant, so key-filtering partials
 *    selects exactly the groups the base filter would keep; any
 *    predicate touching a non-key column disables the rewrite);
 *  - every grouping expression is a bare column ⊆ the rollup's keys
 *    (a strict subset re-aggregates: the partials regroup coarser);
 *  - every aggregate is SUM(col) / SUM(CAST(col AS t)) / COUNT(*) /
 *    MIN(col) / MAX(col) over a registered partial — no DISTINCT, no
 *    FILTER clauses — possibly wrapped in scalar expressions (casts,
 *    arithmetic), which are preserved around the re-aggregated leaf;
 *  - re-aggregated leaves cast back to the original aggregate's result
 *    type (SUM over a DECIMAL partial widens precision), and output
 *    aliases keep their exprIds, so downstream operators and result
 *    schemas are bit-identical to the unrewritten plan.
 *
 * Exactness: COUNT/MIN/MAX and integer/DECIMAL sums re-aggregate
 * EXACTLY (order-free). A raw DOUBLE sum would be reassociated — which
 * is why the query pack's measures go through the repo-standard
 * `CAST(x AS DECIMAL(18,4))` before summing; the rule itself is
 * type-agnostic and rewrites whatever partial was registered.
 *
 * Registered via `spark.experimental.extraOptimizations` (the public
 * session hook for user optimizer rules, applied after the built-in
 * batches); `spark.graft.rollup.enabled=false` is the kill switch.
 */
object RollupRewrite {

  /** A materialized rollup: partial aggregates of `basePaths`' table,
    * grouped by `keys`. `sums` maps (base column, optional pre-sum
    * cast) → partial column; `count` is the per-group row count
    * column; `mins`/`maxs` map base column → partial column. */
  final case class Rollup(
      basePaths: Set[String],
      keys: Seq[String],
      sums: Map[(String, Option[DataType]), String],
      count: Option[String],
      mins: Map[String, String],
      maxs: Map[String, String],
      rollupPath: String)

  private val registry = new ConcurrentHashMap[String, Rollup]()

  /** Root paths of the (v1 parquet) relation a DataFrame scans —
    * the identity under which a base table is registered/matched. */
  def scanPaths(df: DataFrame): Set[String] =
    df.queryExecution.analyzed.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString).toSet
        case _ => Set.empty[String]
      }
    }.flatten.toSet

  def register(base: DataFrame, r: Rollup): Unit =
    r.basePaths.foreach(p => registry.put(p, r))

  def clear(): Unit = registry.clear()

  /** Drop one base table's registration (tests, rollup retirement). */
  def unregister(paths: Set[String]): Unit =
    paths.foreach(registry.remove)

  /** Idempotently append the rule to the session's user optimizations. */
  def ensureInjected(spark: SparkSession): Unit = synchronized {
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[RollupRewriteRule]))
      spark.experimental.extraOptimizations =
        existing :+ RollupRewriteRule(spark)
  }

  /** The rollup is a partial of EXACTLY its registered base paths: a
    * scan whose root-path set differs (e.g. `spark.read.parquet(base,
    * other)`) must not be swapped, or the extra paths' rows silently
    * vanish from the served aggregate — so require full-set equality,
    * not a single-path hit. */
  private[plans] def lookup(paths: Set[String]): Option[Rollup] =
    paths.iterator.map(registry.get)
      .find(r => r != null && r.basePaths == paths)
}

final case class RollupRewriteRule(spark: SparkSession)
    extends Rule[LogicalPlan] {

  import RollupRewrite.Rollup

  private def enabled: Boolean =
    spark.conf.get("spark.graft.rollup.enabled", "true") == "true"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case agg: Aggregate =>
        rewrite(agg).getOrElse(agg)
    }

  /** The Aggregate's input relation paths plus at most one Filter
    * condition, looking through column-pruning Projects of bare
    * attributes. A filter is admissible for serving ONLY if it
    * references rollup KEY columns alone (checked at rewrite time):
    * key columns are constant within a group, so filtering partials by
    * a key predicate selects exactly the groups whose base rows the
    * unrewritten plan would keep — re-aggregation is unchanged. Any
    * second filter or computed projection disqualifies the rewrite. */
  private def baseOf(child: LogicalPlan)
      : Option[(Set[String], Option[Expression])] = child match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        Some((fs.location.rootPaths.map(_.toString).toSet, None))
      case _ => None
    }
    case Project(list, inner) if list.forall(_.isInstanceOf[AttributeReference]) =>
      baseOf(inner)
    case FilterNode(cond, inner) if cond.deterministic =>
      baseOf(inner) match {
        case Some((paths, None)) => Some((paths, Some(cond)))
        case _ => None
      }
    case _ => None
  }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] =
    for {
      pf <- baseOf(agg.child)
      r <- RollupRewrite.lookup(pf._1)
      plan <- rewriteWith(agg, r, pf._2)
    } yield plan

  private def rewriteWith(agg: Aggregate, r: Rollup,
      filterCond: Option[Expression]): Option[LogicalPlan] = {
    // fresh analyzed scan of the rollup (fresh exprIds per rewrite site)
    val roll = spark.read.parquet(r.rollupPath).queryExecution.analyzed
    val rollAttr: Map[String, Attribute] =
      roll.output.map(a => a.name -> a).toMap

    def keyFor(e: Expression): Option[Attribute] = e match {
      case a: AttributeReference if r.keys.contains(a.name) =>
        rollAttr.get(a.name)
      case _ => None
    }

    // SUM child → (base column, optional cast) — must mirror exactly
    // the shape the partial was materialized with
    def sumKey(e: Expression): Option[(String, Option[DataType])] = e match {
      case a: AttributeReference => Some((a.name, None))
      case Cast(a: AttributeReference, dt, _, _) => Some((a.name, Some(dt)))
      case _ => None
    }

    def reAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      val partial: Option[Expression] = ae.aggregateFunction match {
        case s @ Sum(child, _) =>
          sumKey(child).flatMap(r.sums.get).flatMap(rollAttr.get)
            .map(p => s.copy(child = p).toAggregateExpression())
        case Count(Seq(Literal(1, _))) =>
          // COUNT over an empty input is 0 where SUM-of-partials is
          // NULL — reachable only by a GLOBAL aggregate over an empty
          // fact table, but coalesce costs nothing and closes it
          r.count.flatMap(rollAttr.get)
            .map(p => Coalesce(Seq(
              Sum(p).toAggregateExpression(), Literal(0L))))
        case m @ Min(a: AttributeReference) =>
          r.mins.get(a.name).flatMap(rollAttr.get)
            .map(p => m.copy(child = p).toAggregateExpression())
        case m @ Max(a: AttributeReference) =>
          r.maxs.get(a.name).flatMap(rollAttr.get)
            .map(p => m.copy(child = p).toAggregateExpression())
        case _ => None
      }
      // SUM over a widened partial re-widens — restore the original
      // result type so output schemas and downstream exprIds bind
      partial.map(p => if (p.dataType == ae.dataType) p
        else Cast(p, ae.dataType))
    }

    // rewrite one aggregate-list expression tree: aggregate leaves
    // re-aggregate, grouping attrs remap, scalar glue is preserved
    def rewriteExpr(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => reAgg(ae)
      case a: AttributeReference => keyFor(a)
      case l: Literal => Some(l)
      case other if other.children.nonEmpty =>
        val cs = other.children.map(rewriteExpr)
        if (cs.forall(_.isDefined)) Some(other.withNewChildren(cs.map(_.get)))
        else None
      case _ => None
    }

    val newGrouping = agg.groupingExpressions.map(keyFor)
    val newAggs = agg.aggregateExpressions.map {
      case al @ Alias(child, name) =>
        rewriteExpr(child).map(c =>
          Alias(c, name)(exprId = al.exprId, qualifier = al.qualifier,
            explicitMetadata = al.explicitMetadata))
      case a: AttributeReference =>
        keyFor(a).map(k => Alias(k, a.name)(exprId = a.exprId))
      case _ => None
    }
    // a key-only filter remaps onto the rollup's key attributes; any
    // reference to a non-key column (or an unknown leaf) vetoes the
    // rewrite rather than risking semantics
    def remapCond(e: Expression): Option[Expression] = e match {
      case a: AttributeReference => keyFor(a)
      case l: Literal => Some(l)
      case other if other.children.nonEmpty =>
        val cs = other.children.map(remapCond)
        if (cs.forall(_.isDefined)) Some(other.withNewChildren(cs.map(_.get)))
        else None
      case _ => None
    }
    val newChild: Option[LogicalPlan] = filterCond match {
      case None => Some(roll)
      case Some(cond) => remapCond(cond).map(c => FilterNode(c, roll))
    }

    if (newGrouping.forall(_.isDefined) && newAggs.forall(_.isDefined) &&
        newChild.isDefined) {
      logInfo(s"rollup rewrite: serving aggregate from ${r.rollupPath}")
      Some(Aggregate(newGrouping.map(_.get), newAggs.map(_.get), newChild.get))
    } else None
  }
}
