package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule: rewrite exact `COUNT(DISTINCT x)` into the
  * HyperLogLog++ approximation.
  *
  * Why a RULE and not "just call approx_count_distinct": at 100 TB an
  * exact distinct count forces a full shuffle of every distinct value,
  * and exploratory/monitoring workloads often issue `COUNT(DISTINCT …)`
  * from SQL surfaces the engine doesn't control (dashboards, ad-hoc
  * users). With `graft.approxCountDistinct.enabled=true` the session
  * trades the exact answer for the fixed-size-sketch plan globally —
  * semantics-changing, therefore OFF by default, gated per session, and
  * only single-argument, unfiltered counts are rewritten (the conservative
  * subset whose type — BIGINT — and null semantics match exactly).
  *
  * Registered through `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.functions.GraftExtensions]]) or
  * `spark.experimental.extraOptimizations` on a live session.
  */
case class ApproxDistinctRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  val FlagKey = "graft.approxCountDistinct.enabled"

  private def enabled: Boolean =
    java.lang.Boolean.parseBoolean(
      spark.conf.getOption(FlagKey).getOrElse("false"))

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformWithPruning(_.containsPattern(
      org.apache.spark.sql.catalyst.trees.TreePattern.AGGREGATE)) {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(c: Count, _, true, None, _)
              if c.children.length == 1 =>
            ae.copy(
              aggregateFunction = HyperLogLogPlusPlus(c.children.head),
              isDistinct = false)
        }
    }
}
