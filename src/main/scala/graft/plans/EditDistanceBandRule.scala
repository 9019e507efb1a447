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
    * the freshly-added shape `abs(length(l) - length(r))` and its
    * constant-folded residue `abs(length(l) - 9)` — the optimizer
    * batches run to fixpoint with ConstantFolding, which folds the
    * literal side's `length` away between iterations; without the
    * folded match the rule would re-add a band every iteration. A
    * band over EITHER operand suppresses (conservative: a user's own
    * length guard counts). */
  private def hasBand(cond: Expression, l: Expression,
                      r: Expression): Boolean =
    cond.exists {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), _) =>
        Seq(x, y).exists {
          case Length(e) => e.semanticEquals(l) || e.semanticEquals(r)
          case _ => false
        }
      case _ => false
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
