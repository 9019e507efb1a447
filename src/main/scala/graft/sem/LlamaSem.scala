package graft.sem

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Expression builders reproducing the reference engine's observable value
  * semantics (SURVEY.md §1.5) on top of Catalyst expressions.
  *
  * The reference (nukep/llamadb) evaluates expressions dynamically on a
  * `Variant` union type (`src/types/variant.rs:41-398`). We reproduce the
  * *observable* behaviors as declarative Column builders so every one of
  * them stays inside whole-stage codegen — no UDFs.
  *
  * Deliberate deviations (documented per SURVEY.md §7.3):
  *   - arithmetic on mismatched types returns lhs unchanged in the
  *     reference (`variant.rs:308,329`) — we raise an analysis error
  *     instead (Spark's type checking), which is strictly saner.
  *   - `||` with a non-string lhs returns lhs unchanged
  *     (`variant.rs:279-292`) — we concatenate the display forms.
  */
object LlamaSem {

  /** Truthiness of a non-boolean predicate (reference `tests_true()`,
    * `variant.rs:171-182`): non-zero number / non-empty string or bytes is
    * true; SQL NULL is NULL. Boolean columns pass through. Used at every
    * predicate site (WHERE / ON / HAVING) by the llamadb SQL front end,
    * which knows each expression's resolved type. */
  def truthyTyped(c: Column, dt: DataType): Column = dt match {
    case BooleanType    => c
    case _: NumericType => c =!= lit(0).cast(dt)
    case StringType     => length(c) > 0
    case BinaryType     => length(c) > 0
    case NullType       => lit(null).cast(BooleanType)
    case _              => c.cast(BooleanType)
  }

  /** Division with the reference's divide-by-zero → NULL semantics
    * (`variant.rs:362-377`). Spark integral `/` already yields NULL on 0
    * under non-ANSI mode, but double division follows IEEE (±Inf/NaN), so
    * the guard is required for floats. Codegen-friendly: a `when`. */
  def safeDiv(l: Column, r: Column): Column =
    when(r === 0, lit(null)).otherwise(l / r)

  /** String concatenation `||` (`variant.rs:279-292`): both sides rendered
    * to their display form then concatenated. NULL-propagating like SQL. */
  def concatSem(l: Column, r: Column): Column =
    concat(l.cast(StringType), r.cast(StringType))

  /** The reference's `sum()` accumulates as f64 regardless of input type
    * (`aggregate.rs:48-68`); Spark keeps integer sums integral. Cast to
    * double first for exact reference fidelity. */
  def llamaSum(c: Column): Column = sum(c.cast(DoubleType))

  /** Bare (non-aggregated, non-key) column under GROUP BY: the reference
    * returns "any arbitrary row from the group" (`execute/mod.rs:233-247`).
    * Spark analog that stays deterministic for oracle comparison: `min`.
    * `any_value` would be the literal mapping but is nondeterministic. */
  def bareColumn(c: Column): Column = min(c)

  /** NaN is unrepresentable in the reference (`f64nonan.rs:6-20`). Ingest
    * guard: NaN → NULL so comparisons/grouping never see NaN. */
  def noNaN(c: Column): Column = when(isnan(c), lit(null)).otherwise(c)
}
