package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Constraint-based join elimination: a join to a registered primary-key
  * dimension whose columns are never used above the join is dropped
  * entirely — the RELY-constraint query rewrite every warehouse
  * optimizer ships (Oracle join elimination, Snowflake RELY, Trino with
  * connector PK metadata) and Spark itself cannot do for lack of a
  * constraint framework. INNER joins eliminate under the full
  * uniqueness+RI declaration; LEFT/RIGHT OUTER joins to the dimension
  * eliminate under the UNIQUENESS half alone (an outer join to a unique
  * key never drops or duplicates a preserved-side row, whatever the
  * extra ON predicates decide), with no residual filter at all.
  *
  * The ETL-tool shape this kills at 100 TB: a generated star-schema
  * query joins every dimension it MIGHT need, the projection uses two
  * fact columns — each eliminated dimension is a broadcast build (or
  * worse, a shuffle) that never runs.
  *
  * Soundness contract (the registrant's RELY declaration, exactly like
  * `MvRewriteRule`'s freshness contract):
  *   - the registered key set is UNIQUE in the dimension (each fact row
  *     matches at most once — the join cannot duplicate), and
  *   - referential integrity holds: every non-null fact key combination
  *     has a dimension row (the join cannot drop a non-null-keyed row).
  * What the rewrite must still preserve itself: an inner equi-join drops
  * fact rows with a NULL key, so the join is replaced by
  * `IsNotNull(fk_1) AND … AND IsNotNull(fk_n)` over the fact side — free
  * if the keys are non-null, semantics-preserving if they are not.
  *
  * Matching (post-hoc resolution, like the MV rewrite — the plan is
  * still the user's shape): `Project` or `Aggregate` over the join,
  * where one join side is `sameResult` with a registered dimension and
  * the parent references no dimension attribute. For INNER the
  * condition must be a pure conjunction of attribute equalities
  * covering EXACTLY the declared key set (a partial key cannot
  * guarantee uniqueness; an extra predicate changes which fact rows
  * survive); for LEFT/RIGHT OUTER the equalities must cover the key and
  * any extra deterministic conjuncts are tolerated. All-or-nothing;
  * anything else is untouched.
  */
object JoinPruneRule extends Rule[LogicalPlan] {

  private final case class PkEntry(dim: LogicalPlan, pkCols: Seq[String])

  private val registry = new ConcurrentHashMap[String, PkEntry]()

  /** Declare (RELY) that `pkCols` is a unique key of `dim` and that every
    * referencing fact table's non-null key resolves to a `dim` row. */
  def register(key: String, dim: DataFrame, pkCols: Seq[String]): Unit = {
    val out = dim.queryExecution.analyzed.output.map(_.name).toSet
    pkCols.foreach(c => require(out.contains(c),
      s"join prune: declared key column $c is not in the dimension's output"))
    require(pkCols.nonEmpty, "join prune: at least one key column")
    registry.put(key, PkEntry(dim.queryExecution.analyzed, pkCols))
  }

  def unregister(key: String): Unit = registry.remove(key)
  def clear(): Unit = registry.clear()

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registry.isEmpty) plan
    else plan.transform {
      // the generated-BI shapes: a projection, or an aggregate, directly
      // over the star join — in both, "uses no dimension column" is decided
      // by the parent's references
      case p @ Project(projList, j: Join) if j.condition.isDefined =>
        tryPrune(projList.flatMap(_.references), j,
          fact => Project(projList, fact)).getOrElse(p)
      case a @ Aggregate(groupExprs, aggExprs, j: Join, hint) if j.condition.isDefined =>
        tryPrune((groupExprs ++ aggExprs).flatMap(_.references), j,
          fact => Aggregate(groupExprs, aggExprs, fact, hint)).getOrElse(a)
    }

  private def tryPrune(used: Seq[Attribute], j: Join,
                       rebuild: LogicalPlan => LogicalPlan): Option[LogicalPlan] = {
    val cond = j.condition.get
    registry.values().asScala
      .collectFirst(Function.unlift { e =>
        j.joinType match {
          // inner joins drop NULL/unmatched fact keys: elimination leans on
          // declared RI and must preserve the NULL-key drop itself
          case Inner =>
            prune(used, j.left, j.right, cond, e, outer = false)
              .orElse(prune(used, j.right, j.left, cond, e, outer = false))
          // OUTER joins to a unique key never drop or duplicate a fact row,
          // whatever the extra ON predicates do — elimination needs ONLY
          // the uniqueness half of the declaration, not RI, and no filter
          case LeftOuter => prune(used, j.left, j.right, cond, e, outer = true)
          case RightOuter => prune(used, j.right, j.left, cond, e, outer = true)
          case _ => None
        }
      })
      .map(rebuild)
  }

  /** The replacement for the fact side, if `dim` (matched against `e`)
    * can be eliminated from fact ⋈ dim: the fact itself for an outer
    * join, the key-not-null filtered fact for an inner join. */
  private def prune(used: Seq[Attribute], fact: LogicalPlan,
                    dim: LogicalPlan, cond: Expression,
                    e: PkEntry, outer: Boolean): Option[LogicalPlan] = {
    // sameResult canonicalizes both trees (O(plan size) per call, paid by
    // every candidate join in every query while a registration is live) —
    // plans with positionally different output types can never match, so
    // an O(#columns) schema check gates the expensive comparison
    if (dim.output.length != e.dim.output.length ||
      !dim.output.iterator.zip(e.dim.output.iterator)
        .forall { case (x, y) => x.dataType == y.dataType }) return None
    if (!dim.sameResult(e.dim)) return None
    val dimIds = dim.outputSet
    val factIds = fact.outputSet
    // positional name map: the matched dim's attribute ids → registered names
    val dimNameOf: Map[ExprId, String] =
      dim.output.map(_.exprId).zip(e.dim.output.map(_.name)).toMap

    val conjuncts = splitConjunction(cond)
    val classified = conjuncts.map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if factIds.contains(a) && dimIds.contains(b) => scala.Right((a, b))
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if factIds.contains(a) && dimIds.contains(b) => scala.Right((a, b))
      case other => scala.Left(other)
    }
    val eqs = classified.collect { case scala.Right(p) => p }
    val others = classified.collect { case scala.Left(c) => c }
    val equatedDim = eqs.map { case (_, d) => dimNameOf(d.exprId) }
    if (outer) {
      // extra predicates only turn a match into a non-match — the fact row
      // is output exactly once either way, provided ≤ 1 match (pk covered)
      if (!e.pkCols.toSet.subsetOf(equatedDim.toSet)) return None
      if (others.exists(!_.deterministic)) return None
    } else {
      // inner: a pure equi-conjunction covering EXACTLY the unique key
      if (others.nonEmpty) return None
      if (equatedDim.toSet != e.pkCols.toSet ||
        equatedDim.distinct.size != equatedDim.size) return None
    }
    // the parent must not touch the dimension
    if (used.exists(dimIds.contains)) return None

    if (outer) Some(fact)
    else {
      // inner-join null semantics: rows with a NULL fact key are dropped
      // by the join, so they must be dropped by the replacement too
      Some(Filter(eqs.map { case (f, _) => IsNotNull(f): Expression }
        .reduce(And.apply), fact))
    }
  }

  private def splitConjunction(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjunction(l) ++ splitConjunction(r)
    case other => Seq(other)
  }
}
