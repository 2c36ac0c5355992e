package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite `levenshtein(a, b) <= k` (and `< k`) with a
  * literal bound into
  *
  * {{{ abs(length(a) - length(b)) <= k AND levenshtein(a, b, k) >= 0 }}}
  *
  * Two wins, both free for the user who wrote the natural predicate:
  *
  *  1. the LENGTH BAND is a Levenshtein lower bound — a codegen'd O(1)
  *     prefilter that skips the O(|a|·|b|) DP entirely for most
  *     non-matching pairs (on a blocked near-dup join this is the
  *     difference between quadratic-in-length work per candidate pair
  *     and a length compare);
  *  2. the surviving pairs run the THRESHOLDED Levenshtein, whose DP
  *     abandons a row as soon as the running minimum exceeds `k`
  *     (returns −1, hence the `>= 0` form — a plain `<= k` would
  *     wrongly accept the −1 sentinel).
  *
  * Null semantics are preserved: any null input makes both the original
  * and the rewritten predicate null. The rewrite is a pure expression
  * equivalence, so it applies anywhere the pattern appears (Filter,
  * join condition, projection). Idempotent by construction — the
  * rewritten form carries a threshold, which the pattern excludes.
  *
  * Registered via [[GraftFunctions.register]] (runtime,
  * `spark.experimental.extraOptimizations`) or the
  * [[GraftExtensions]] session extension.
  */
object LevenshteinBandRule extends Rule[LogicalPlan] {

  private def banded(a: Expression, b: Expression, k: Int): Expression = {
    val kLit = Literal(k, IntegerType)
    And(
      LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), kLit),
      GreaterThanOrEqual(Levenshtein(a, b, Some(kLit)), Literal(0, IntegerType)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 0 =>
        banded(a, b, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 0 =>
        banded(a, b, k)
      case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 1 =>
        banded(a, b, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 1 =>
        banded(a, b, k - 1)
    }
}
