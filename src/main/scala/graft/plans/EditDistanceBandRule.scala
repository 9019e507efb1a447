package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Catalyst optimizer rule: bounded-edit-distance filters gain a FREE
  * length-band prefilter.
  *
  * `levenshtein(a, b) <= k` implies `abs(length(a) - length(b)) <= k`
  * (each edit changes the length by at most one), so the rule rewrites
  *
  * {{{ Filter(levenshtein(a, b) <= k, child) }}}
  * into
  * {{{ Filter(abs(length(a) - length(b)) <= k AND levenshtein(a, b) <= k,
  *            child) }}}
  *
  * — semantically transparent, and `And` evaluates left-to-right in
  * codegen, so the O(1) band check gates the O(|a|·|b|) dynamic-program
  * per row. On a fuzzy self-join this is the length-blocking lever the
  * q144 operator applies by hand, supplied automatically by the
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
    * iteration. The folded case requires the OTHER side to be a
    * literal: a user's own guard over an unrelated pair (e.g.
    * `abs(length(l) - length(z))`) must NOT suppress the band for
    * (l, r) — it implies nothing about their length gap. */
  private def hasBand(cond: Expression, l: Expression,
                      r: Expression): Boolean = {
    def isOperand(e: Expression): Boolean =
      e.semanticEquals(l) || e.semanticEquals(r)
    cond.exists {
      case LessThanOrEqual(Abs(Subtract(Length(a), Length(b), _), _), _) =>
        (a.semanticEquals(l) && b.semanticEquals(r)) ||
          (a.semanticEquals(r) && b.semanticEquals(l))
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), _) =>
        (x, y) match {
          case (Length(e), _: Literal) => isOperand(e)
          case (_: Literal, Length(e)) => isOperand(e)
          case _ => false
        }
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val newCond = cond.transformUp {
        case cmp @ LessThanOrEqual(lev: Levenshtein,
                                   k @ Literal(_, IntegerType))
            if lev.threshold.isEmpty && !hasBand(cond, lev.left, lev.right) =>
          And(bandFor(lev.left, lev.right, k), cmp)
        case cmp @ LessThan(lev: Levenshtein, k @ Literal(_, IntegerType))
            if lev.threshold.isEmpty && !hasBand(cond, lev.left, lev.right) =>
          And(bandFor(lev.left, lev.right, k), cmp)
      }
      if (newCond fastEquals cond) f else Filter(newCond, child)
  }
}
