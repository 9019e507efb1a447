package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Catalyst optimizer rule: bounded-edit-distance filters gain a FREE
  * length-band prefilter AND the banded early-exit dynamic program.
  *
  * `levenshtein(a, b) <= k` implies `abs(length(a) - length(b)) <= k`
  * (each edit changes the length by at most one), and is equivalent to
  * `levenshtein(a, b, k) >= 0` (Spark's thresholded form runs an
  * O(k·n) banded DP that bails out past k and returns −1, instead of
  * filling the full O(|a|·|b|) table). The rule rewrites
  *
  * {{{ Filter(levenshtein(a, b) <= k, child) }}}
  * into
  * {{{ Filter(abs(length(a) - length(b)) <= k
  *            AND levenshtein(a, b, k) >= 0, child) }}}
  *
  * (and `< k` via k−1) — semantically transparent, and `And` evaluates
  * left-to-right in codegen, so the O(1) band check gates the O(k·n)
  * DP per row. On a fuzzy self-join this is the length-blocking lever
  * the q144 operator applies by hand, supplied automatically by the
  * optimizer to ANY query (SQL or DataFrame) that bounds an edit
  * distance. Register via `spark.experimental.extraOptimizations` or a
  * `SparkSessionExtensions.injectOptimizerRule`.
  *
  * Idempotence (the optimizer runs batches to fixpoint): a Filter whose
  * condition already contains a length-band guard for the same operand
  * pair is left untouched.
  */
object EditDistanceBandRule extends Rule[LogicalPlan] {

  private def bandFor(l: Expression, r: Expression,
                      k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(l), Length(r))), k)

  /** Does `cond` already carry a band guard over (l, r)? Matches both
    * the freshly-added shape `abs(length(l) - length(r))` (exact
    * operand-pair match, either order) and its constant-folded residue
    * `abs(length(l) - 9)` (one side folded to a literal) — the
    * optimizer batches run to fixpoint with ConstantFolding, which
    * folds the literal side's `length` away between iterations;
    * without the folded match the rule would re-add a band every
    * iteration. The folded case only counts when the band literal IS
    * the folded length of the OTHER levenshtein operand (a string
    * literal of exactly that length): a user's own guard over an
    * unrelated pair (`abs(length(l) - length(z))`) or against an
    * unrelated constant (`abs(length(l) - 5) <= 100`) implies nothing
    * about the (l, r) gap and must NOT suppress the band. */
  private def hasBand(cond: Expression, l: Expression,
                      r: Expression): Boolean = {
    // is `lenLit` the folded `length(<other operand>)` for operand `e`?
    def isFoldedPair(e: Expression, lenLit: Literal): Boolean = {
      def otherFoldsTo(other: Expression): Boolean = (other, lenLit) match {
        case (s: Literal, Literal(n: Int, IntegerType))
            if s.dataType == org.apache.spark.sql.types.StringType &&
               s.value != null =>
          s.value.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
            .numChars == n
        case _ => false
      }
      (e.semanticEquals(l) && otherFoldsTo(r)) ||
        (e.semanticEquals(r) && otherFoldsTo(l))
    }
    cond.exists {
      case LessThanOrEqual(Abs(Subtract(Length(a), Length(b), _), _), _) =>
        (a.semanticEquals(l) && b.semanticEquals(r)) ||
          (a.semanticEquals(r) && b.semanticEquals(l))
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), _) =>
        (x, y) match {
          case (Length(e), lit: Literal) => isFoldedPair(e, lit)
          case (lit: Literal, Length(e)) => isFoldedPair(e, lit)
          case _ => false
        }
      case _ => false
    }
  }

  /** The rewritten predicate: thresholded early-exit DP, plus the
    * length band when `cond` doesn't already carry one.
    *
    * `levenshtein(a, b) <= k` ≡ `levenshtein(a, b, k) >= 0`: Spark's
    * 3-arg form runs the BANDED dynamic program — O(k·n) cells and an
    * early exit the moment every diagonal exceeds k — instead of the
    * full O(|a|·|b|) table, and returns −1 past the threshold. For
    * bounded fuzzy filters (k ≪ string length) this is the dominant
    * win; the O(1) band guard still fronts it so most rows never
    * reach the DP at all. */
  private def rewrite(cond: Expression, lev: Levenshtein,
                      bound: Expression): Expression = {
    val banded = GreaterThanOrEqual(
      Levenshtein(lev.left, lev.right, Some(bound)), Literal(0))
    if (hasBand(cond, lev.left, lev.right)) banded
    else And(bandFor(lev.left, lev.right, bound), banded)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val newCond = cond.transformUp {
        case LessThanOrEqual(lev: Levenshtein, k @ Literal(_: Int,
                                                           IntegerType))
            if lev.threshold.isEmpty =>
          rewrite(cond, lev, k)
        case LessThan(lev: Levenshtein, Literal(ki: Int, IntegerType))
            if lev.threshold.isEmpty && ki > 0 =>
          // d < k ⟺ d ≤ k−1 — band and threshold both use k−1
          rewrite(cond, lev, Literal(ki - 1, IntegerType))
      }
      if (newCond fastEquals cond) f else Filter(newCond, child)
  }
}
