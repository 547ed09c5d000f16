package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: strengthen bounded edit-distance filters with a free
  * length pre-filter.
  *
  * `levenshtein(a, b) <= k` implies `abs(length(a) - length(b)) <= k` —
  * the DP result can never be smaller than the length difference. The
  * length check is O(1) per row while the DP is O(|a|·|b|); at
  * candidate-pair scale (fuzzy dedup joins over 100 TB of text) most
  * pairs fail the bound and never pay the quadratic work. The conjunct
  * also constant-folds/codegens like any comparison, so it runs inside
  * the same WholeStageCodegen stage before the expensive call.
  *
  * Semantics-preserving (the added conjunct is implied by the original,
  * including the null case: a null input nulls both sides of the And the
  * same way the original predicate nulls), so ON by default; kill switch:
  * `graft.levenshteinPrefilter.enabled=false`.
  *
  * Conservative subset: only `levenshtein(a, b) <= k` / `< k` (and their
  * mirrored `k >= lev` / `k > lev` forms) where the comparison is over
  * INTEGER and `k` is deterministic; the three-argument threshold form
  * already bounds its own DP. Idempotent across optimizer fixed-point
  * iterations: a filter whose condition already contains the implied
  * conjunct (semantically) is left alone.
  */
case class LevenshteinPrefilter(spark: SparkSession) extends Rule[LogicalPlan] {

  val FlagKey = "graft.levenshteinPrefilter.enabled"

  private def enabled: Boolean =
    spark.conf.getOption(FlagKey).forall(java.lang.Boolean.parseBoolean)

  private def bound(lev: Levenshtein, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(lev.left), Length(lev.right))), k)

  private def eligible(lev: Levenshtein, k: Expression): Boolean =
    lev.threshold.isEmpty && k.deterministic && k.dataType == IntegerType &&
      lev.left.deterministic && lev.right.deterministic

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformWithPruning(_.containsPattern(
      org.apache.spark.sql.catalyst.trees.TreePattern.FILTER)) {
      case f @ Filter(cond, child) =>
        val augmented = cond.transformUp {
          case cmp @ LessThanOrEqual(lev: Levenshtein, k)
              if eligible(lev, k) && !hasBound(cond, lev, k) =>
            And(bound(lev, k), cmp)
          case cmp @ LessThan(lev: Levenshtein, k)
              if eligible(lev, k) && !hasBound(cond, lev, k) =>
            And(bound(lev, k), cmp)
          case cmp @ GreaterThanOrEqual(k, lev: Levenshtein)
              if eligible(lev, k) && !hasBound(cond, lev, k) =>
            And(bound(lev, k), cmp)
          case cmp @ GreaterThan(k, lev: Levenshtein)
              if eligible(lev, k) && !hasBound(cond, lev, k) =>
            And(bound(lev, k), cmp)
        }
        if (augmented.fastEquals(cond)) f else Filter(augmented, child)
    }

  /** True when the filter already carries the implied length bound for
    * this (lev, k) — keeps the rule a no-op on its own output when the
    * optimizer batch runs to fixed point. */
  private def hasBound(cond: Expression, lev: Levenshtein, k: Expression): Boolean = {
    val b = bound(lev, k)
    cond.exists(_.semanticEquals(b))
  }
}
