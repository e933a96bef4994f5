package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Constraint-based join elimination: an INNER join to a registered
  * primary-key dimension whose columns are never used above the join is
  * dropped entirely — the RELY-constraint query rewrite every warehouse
  * optimizer ships (Oracle join elimination, Snowflake RELY, Trino with
  * connector PK metadata) and Spark itself cannot do for lack of a
  * constraint framework. The ETL-tool shape this kills at 100 TB: a
  * generated star-schema query joins every dimension it MIGHT need, the
  * projection uses two fact columns — each eliminated dimension is a
  * broadcast build (or worse, a shuffle) that never runs.
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
  * still the user's shape): `Project` or `Aggregate` over `Join(Inner)`
  * where one join side is `sameResult` with a registered dimension, the join
  * condition is a pure conjunction of attribute equalities covering
  * EXACTLY the declared key set (a partial key cannot guarantee
  * uniqueness; an extra non-key equality is a real predicate on the
  * dimension and blocks elimination), and the projection references no
  * dimension attribute. All-or-nothing; anything else is untouched.
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

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // the generated-BI shapes: a projection, or an aggregate, directly
    // over the star join — in both, "uses no dimension column" is decided
    // by the parent's references
    case p @ Project(projList, Join(left, right, Inner, Some(cond), _)) =>
      tryPrune(projList.flatMap(_.references), left, right, cond,
        fact => Project(projList, fact)).getOrElse(p)
    case a @ Aggregate(groupExprs, aggExprs, Join(left, right, Inner, Some(cond), _), hint) =>
      tryPrune((groupExprs ++ aggExprs).flatMap(_.references), left, right, cond,
        fact => Aggregate(groupExprs, aggExprs, fact, hint)).getOrElse(a)
  }

  private def tryPrune(used: Seq[Attribute], left: LogicalPlan, right: LogicalPlan,
                       cond: Expression,
                       rebuild: LogicalPlan => LogicalPlan): Option[LogicalPlan] =
    registry.values().asScala
      .collectFirst(Function.unlift { e =>
        prune(used, left, right, cond, e).orElse(prune(used, right, left, cond, e))
      })
      .map(rebuild)

  /** The fact side wrapped in the key-not-null filter, if `dim` (matched
    * against `e`) can be eliminated from fact ⋈ dim. */
  private def prune(used: Seq[Attribute], fact: LogicalPlan,
                    dim: LogicalPlan, cond: Expression,
                    e: PkEntry): Option[LogicalPlan] = {
    if (!dim.sameResult(e.dim)) return None
    val dimIds = dim.outputSet
    val factIds = fact.outputSet
    // positional name map: the matched dim's attribute ids → registered names
    val dimNameOf: Map[ExprId, String] =
      dim.output.map(_.exprId).zip(e.dim.output.map(_.name)).toMap

    // the condition must be a pure conjunction of fact-attr = dim-attr
    val pairs = splitConjunction(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if factIds.contains(a) && dimIds.contains(b) => Some((a, b))
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if factIds.contains(a) && dimIds.contains(b) => Some((a, b))
      case _ => None
    }
    if (pairs.exists(_.isEmpty)) return None
    val eqs = pairs.map(_.get)
    // equated dim columns = EXACTLY the declared unique key
    val equatedDim = eqs.map { case (_, d) => dimNameOf(d.exprId) }
    if (equatedDim.toSet != e.pkCols.toSet || equatedDim.distinct.size != equatedDim.size)
      return None
    // the parent must not touch the dimension
    if (used.exists(dimIds.contains)) return None

    // inner-join null semantics: rows with a NULL fact key are dropped by
    // the join, so they must be dropped by the replacement too
    val notNulls = eqs.map { case (f, _) => IsNotNull(f): Expression }
      .reduce(And.apply)
    Some(Filter(notNulls, fact))
  }

  private def splitConjunction(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjunction(l) ++ splitConjunction(r)
    case other => Seq(other)
  }
}
