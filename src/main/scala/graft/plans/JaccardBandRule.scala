package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.JaccardSimilarity

/** Optimizer rule: derive a cheap SIZE-BAND guard from a Jaccard threshold
  * predicate — the set-similarity sibling of [[LevenshteinBandRule]].
  * `graft_jaccard(a, b) >= t` implies `|a| >= t·|b| AND |b| >= t·|a|`
  * (J ≤ |a∩b|/|a∪b| ≤ min/max), so two O(1) array-header size reads can
  * short-circuit the O(|a|+|b|) intersect/union hash build for every
  * candidate pair whose cardinalities already rule it out. In the LSH
  * verify join that is every banding collision between a long and a short
  * document — cheap to reject, previously full price.
  *
  * Additive and implied, like the Levenshtein band: results are
  * bit-identical (a NULL side makes the guard NULL exactly where the
  * original predicate was already NULL), so every oracle stays green.
  * Idempotent the same way: a guard is added only when no semantically
  * equal conjunct exists.
  */
object JaccardBandRule extends Rule[LogicalPlan] with PredicateHelper {

  private def sz(e: Expression): Expression =
    Cast(Size(e, legacySizeOfNull = false), DoubleType)

  private def asD(k: Expression): Expression =
    if (k.dataType == DoubleType) k else Cast(k, DoubleType)

  /** |a| >= t·|b| AND |b| >= t·|a| — sound for any t (trivially true when
    * t <= 0; implied via J <= min/max when t > 0; also sound for the strict
    * `> t` form since jac > t ⇒ jac >= t). */
  private def bandGuard(a: Expression, b: Expression, k: Expression): Seq[Expression] = Seq(
    GreaterThanOrEqual(sz(a), Multiply(asD(k), sz(b))),
    GreaterThanOrEqual(sz(b), Multiply(asD(k), sz(a))))

  private def impliedGuards(conjuncts: Seq[Expression]): Seq[Expression] =
    conjuncts.flatMap {
      case GreaterThanOrEqual(JaccardSimilarity(a, b), k) if k.foldable => bandGuard(a, b, k)
      case GreaterThan(JaccardSimilarity(a, b), k) if k.foldable => bandGuard(a, b, k)
      case LessThanOrEqual(k, JaccardSimilarity(a, b)) if k.foldable => bandGuard(a, b, k)
      case LessThan(k, JaccardSimilarity(a, b)) if k.foldable => bandGuard(a, b, k)
      case _ => Nil
    }

  /** cond + any missing implied guards, guards FIRST so the size check
    * short-circuits ahead of the set kernel. */
  private def withGuards(cond: Expression): Option[Expression] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val missing = impliedGuards(conjuncts)
      .filterNot(g => conjuncts.exists(_.semanticEquals(g)))
    if (missing.isEmpty) None else Some((missing ++ conjuncts).reduce(And))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      withGuards(cond).map(Filter(_, child)).getOrElse(f)
    case j @ Join(left, right, jt, Some(cond), hint) =>
      withGuards(cond).map(c => Join(left, right, jt, Some(c), hint)).getOrElse(j)
  }
}
