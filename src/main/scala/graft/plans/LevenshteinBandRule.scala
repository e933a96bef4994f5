package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: derive a cheap LENGTH-BAND guard from an edit-distance
  * threshold predicate. `levenshtein(a, b) <= k` implies
  * `abs(length(a) - length(b)) <= k` (each insert/delete changes the length
  * by one), so the O(1)-per-row band check can short-circuit the O(|a|·|b|)
  * dynamic program for every candidate pair whose lengths already rule it
  * out — in a blocked fuzzy join (EntityResolution) that is most of the
  * candidate set whenever record lengths vary.
  *
  * The rewrite is purely ADDITIVE and implied by the original predicate —
  * results are bit-identical, which is what keeps every oracle green while
  * the plan gets cheaper. Injected through
  * `SparkSessionExtensions.injectOptimizerRule` (GraftExtensions), running
  * in the user-rules batch after the main optimizer, i.e. after predicate
  * pushdown has already inlined projected aliases into the Filter.
  *
  * Idempotent by construction: a guard is only added when no semantically
  * equal conjunct is already present, so the fixed-point optimizer
  * terminates with exactly one guard per distance predicate.
  */
object LevenshteinBandRule extends Rule[LogicalPlan] with PredicateHelper {

  /** The implied band guard for a distance bound `k` (also sound for the
    * strict `< k` form: lendiff <= lev < k ⇒ lendiff <= k). */
  private def bandGuard(a: Expression, b: Expression, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k)

  /** Distance-threshold conjuncts we can derive a band from. Only the
    * direct int-typed comparison shapes — an analyzer-inserted cast means
    * the types were widened and we simply skip the opportunity. */
  private def impliedGuards(conjuncts: Seq[Expression]): Seq[Expression] =
    conjuncts.collect {
      case LessThanOrEqual(Levenshtein(a, b, None), k) if k.foldable => bandGuard(a, b, k)
      case LessThan(Levenshtein(a, b, None), k) if k.foldable => bandGuard(a, b, k)
      case GreaterThanOrEqual(k, Levenshtein(a, b, None)) if k.foldable => bandGuard(a, b, k)
      case GreaterThan(k, Levenshtein(a, b, None)) if k.foldable => bandGuard(a, b, k)
    }

  /** cond + any missing implied guards (None if nothing to add). Guards go
    * FIRST: And short-circuits left-to-right in both interpreted and
    * generated code, so the band check runs before the DP. */
  private def withGuards(cond: Expression): Option[Expression] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val missing = impliedGuards(conjuncts)
      .filterNot(g => conjuncts.exists(_.semanticEquals(g)))
    if (missing.isEmpty) None else Some((missing ++ conjuncts).reduce(And))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      withGuards(cond).map(Filter(_, child)).getOrElse(f)
    // PushPredicateThroughJoin merges the distance filter of a blocked
    // fuzzy join into the join condition before this batch runs — the
    // guard then evaluates in the post-match join filter, still ahead of
    // the DP
    case j @ Join(left, right, jt, Some(cond), hint) =>
      withGuards(cond).map(c => Join(left, right, jt, Some(c), hint)).getOrElse(j)
  }
}
