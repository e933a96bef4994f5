package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Automatic aggregate→materialized-view rewrite: a `GROUP BY` over a
  * registered base table answers from its maintained rollup instead of
  * re-scanning the base — the classic warehouse MV rewrite (Oracle query
  * rewrite, BigQuery/Snowflake MV smart tuning). At 100 TB this is the
  * difference between a full-corpus scan and a megabytes-sized rollup
  * read for every dashboard-shaped query; the rollup itself is maintained
  * incrementally ([[graft.operators.IncrementalAgg.mergeStates]] /
  * `stream_rollup_table`'s sink combiner), so neither refresh nor query
  * ever touches O(history) again.
  *
  * Matching is by Catalyst plan equivalence, not by path or name: the
  * query's `Aggregate` child must be `sameResult` with the registered base
  * plan — the exact mechanism Spark's own `CacheManager` uses to swap in
  * `InMemoryRelation`s, so projection order, attribute ids, and alias
  * noise are canonicalized away. Runs as a post-hoc resolution rule: at
  * that point the child IS the base frame's analyzed plan (no pruning has
  * rewritten it yet), and the swapped-in plan re-analyzes/optimizes like
  * any user plan.
  *
  * Rewrite algebra (all-or-nothing per Aggregate node — one unmappable
  * expression and the node is left untouched):
  *   - grouping column (⊆ the MV's grain)      → MV grouping column
  *   - `count(*)` / `count(lit)`               → `sum(count partial)`
  *   - `count(col)`                            → `sum(per-col count partial)`
  *   - `sum(col)`                              → `sum(sum partial)`
  *   - `min(col)` / `max(col)`                 → `min/max(min/max partial)`
  *   - a deterministic WHERE between aggregate and base that references
  *     grain columns only → the same predicate over the MV (it selects
  *     whole groups, so it commutes with the rollup); a predicate
  *     touching any measure column aborts the rewrite
  * Derived metrics (avg = sum/count) are deliberately NOT matched: the
  * mergeable-state discipline (IncrementalAgg) stores associative partials
  * only and re-derives ratios AFTER the merge — a query does the same in a
  * projection above the aggregate, which this rule leaves alone.
  * DISTINCT aggregates and FILTER clauses never match (not derivable from
  * a coarser rollup). A pure-grouping Aggregate (DISTINCT query shape)
  * does match: the MV has exactly the base's group combinations.
  *
  * Freshness is the registrant's contract: register AFTER each MV refresh
  * (`register` replaces by MV identity), `clear`/`unregister` on
  * staleness. Results are indistinguishable when the MV is current — the
  * invariant of incremental view maintenance, hash-graded end-to-end by
  * `mv_rewrite_scan`.
  */
object MvRewriteRule extends Rule[LogicalPlan] {

  /** One registered rollup: `base` is the analyzed plan queries are
    * matched against; `mv` the analyzed plan of the rollup read;
    * `groupCols` the MV's grain (names shared by base and MV); the
    * partial maps go base-column-name → MV partial-column-name. */
  private final case class MvEntry(
      base: LogicalPlan, mv: LogicalPlan,
      groupCols: Set[String], countStar: Option[String],
      countOf: Map[String, String], sumOf: Map[String, String],
      minOf: Map[String, String], maxOf: Map[String, String])

  /** Keyed by a caller-chosen identity (the MV's storage path): bench
    * sweeps re-register each invocation and must replace, not accumulate. */
  private val registry = new ConcurrentHashMap[String, MvEntry]()

  def register(key: String, base: DataFrame, mv: DataFrame,
               groupCols: Seq[String], countStar: Option[String] = None,
               countOf: Map[String, String] = Map.empty,
               sumOf: Map[String, String] = Map.empty,
               minOf: Map[String, String] = Map.empty,
               maxOf: Map[String, String] = Map.empty): Unit = {
    val mvOut = mv.queryExecution.analyzed.output.map(_.name).toSet
    val declared = groupCols ++ countStar ++
      countOf.values ++ sumOf.values ++ minOf.values ++ maxOf.values
    declared.foreach(c => require(mvOut.contains(c),
      s"MV rewrite: declared column $c is not in the MV's output ${mvOut.mkString(", ")}"))
    registry.put(key, MvEntry(base.queryExecution.analyzed,
      mv.queryExecution.analyzed, groupCols.toSet, countStar,
      countOf, sumOf, minOf, maxOf))
  }

  def unregister(key: String): Unit = registry.remove(key)
  def clear(): Unit = registry.clear()

  /** `sameResult` canonicalizes BOTH trees — O(plan size) with allocation,
    * and the query side pays it fresh on every optimizer invocation. A
    * session keeps MVs registered for its lifetime (that is the contract),
    * so every Aggregate in every unrelated query would pay that tax per
    * registered entry. Two plans can only be sameResult if their outputs
    * align positionally in type — check that in O(#columns) first. */
  private def schemaCompatible(a: LogicalPlan, b: LogicalPlan): Boolean =
    a.output.length == b.output.length &&
      a.output.iterator.zip(b.output.iterator).forall { case (x, y) => x.dataType == y.dataType }

  /** First registered entry whose base matches `child` AND whose partials
    * can map this aggregate (two MVs at different grains over one base:
    * a failed mapping falls through to the next entry). */
  private def firstRewrite(agg: Aggregate, child: LogicalPlan,
                           filter: Option[Expression]): Option[Aggregate] =
    registry.values().asScala
      .collectFirst(Function.unlift { e =>
        if (schemaCompatible(child, e.base) && child.sameResult(e.base))
          rewrite(agg, child, filter, e)
        else None
      })

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registry.isEmpty) plan
    else plan.transform {
      // a deterministic filter BETWEEN the aggregate and the base commutes
      // with the rollup when it only references grain columns: it selects
      // whole groups, so filtering the MV's rows is the same set algebra
      case agg @ Aggregate(_, _, Filter(cond, child), _) if cond.deterministic =>
        firstRewrite(agg, child, Some(cond)).getOrElse(agg)
      case agg @ Aggregate(_, _, child, _) =>
        firstRewrite(agg, child, None).getOrElse(agg)
    }

  private def rewrite(agg: Aggregate, child: LogicalPlan,
                      filter: Option[Expression], e: MvEntry): Option[Aggregate] = {
    // child output position i ↔ registered base output position i
    // (sameResult guarantees positional schema equivalence; NAMES may
    // differ through alias noise, so map ids to the REGISTERED names the
    // partial maps are declared in)
    val baseNameOf: Map[ExprId, String] =
      child.output.map(_.exprId).zip(e.base.output.map(_.name)).toMap

    // fresh MV instance per rewrite: two rewrites in one tree (self-join
    // of two rollup queries) must not share output attribute ids
    val mv = e.mv.transformUp {
      case m: MultiInstanceRelation => m.newInstance().asInstanceOf[LogicalPlan]
    }
    def mvAttr(name: String): Attribute = mv.output.find(_.name == name).get

    // the interposed filter must reference grain columns only — then it
    // selects whole groups and commutes with the rollup; anything else
    // (a measure-column predicate filters ROWS, not groups) aborts
    val mappedCond: Option[Option[Expression]] = filter match {
      case None => Some(None)
      case Some(c) =>
        var ok = true
        val m = c.transform {
          case a: AttributeReference =>
            baseNameOf.get(a.exprId).filter(e.groupCols.contains) match {
              case Some(n) => mvAttr(n)
              case None => ok = false; a
            }
        }
        if (ok) Some(Some(m)) else None
    }

    // grouping: plain base columns within the MV grain, or no rewrite
    val groups: Option[Seq[(ExprId, Attribute)]] =
      agg.groupingExpressions.foldLeft(Option(Seq.empty[(ExprId, Attribute)])) {
        case (acc, a: AttributeReference) =>
          acc.flatMap { g =>
            baseNameOf.get(a.exprId).filter(e.groupCols.contains)
              .map(n => g :+ (a.exprId -> mvAttr(n)))
          }
        case _ => None
      }

    groups.flatMap { g =>
      val groupAttrOf = g.toMap
      def partialOf(m: Map[String, String], a: AttributeReference): Option[Attribute] =
        baseNameOf.get(a.exprId).flatMap(m.get).map(mvAttr)

      // each result expression must map, else the node stays untouched
      val mapped: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
        case a: AttributeReference =>
          groupAttrOf.get(a.exprId).map(mv0 =>
            Alias(mv0, a.name)(exprId = a.exprId))
        case al @ Alias(AggregateExpression(fn, Complete, false, None, _), name) =>
          val rebuilt: Option[Expression] = fn match {
            case Count(Seq(Literal(v, _))) if v != null =>
              // count(*)/count(lit): every MV row's partial count is ≥ 1 and
              // non-null, so the rolled-up sum can never be null — keep the
              // original count's non-nullable schema
              e.countStar.map(c => KnownNotNull(Sum(mvAttr(c)).toAggregateExpression()))
            case Count(Seq(a: AttributeReference)) =>
              partialOf(e.countOf, a).map(p => KnownNotNull(Sum(p).toAggregateExpression()))
            case Sum(a: AttributeReference, _) =>
              partialOf(e.sumOf, a).map(p => Sum(p).toAggregateExpression())
            case Min(a: AttributeReference) =>
              partialOf(e.minOf, a).map(p => Min(p).toAggregateExpression())
            case Max(a: AttributeReference) =>
              partialOf(e.maxOf, a).map(p => Max(p).toAggregateExpression())
            case _ => None
          }
          rebuilt.map { r =>
            // sum-of-sum widens decimals one more step than the original
            // single-level sum; cast back so the rewrite is schema-invisible
            val typed = if (r.dataType == al.dataType) r
              else Cast(r, al.dataType, Option(conf.sessionLocalTimeZone))
            Alias(typed, name)(exprId = al.exprId)
          }
        case _ => None
      }

      mappedCond.flatMap { condOpt =>
        if (mapped.forall(_.isDefined))
          Some(Aggregate(g.map(_._2), mapped.map(_.get),
            condOpt.map(Filter(_, mv)).getOrElse(mv)))
        else None
      }
    }
  }
}
