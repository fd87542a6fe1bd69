package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{CreateStruct, Expression, If, IsNull, Literal, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Config-gated optimizer rule: rewrite every exact `COUNT(DISTINCT x)`
  * to the mergeable HLL++ sketch (`approx_count_distinct`) when
  * `spark.graft.approxDistinct = true`.
  *
  * Why a RULE and not a rewritten query: exact distinct aggregation is
  * the one shape in this engine whose cost changes CLASS at scale — it
  * forces an Expand + a shuffle keyed on (group, value) carrying every
  * distinct value, where HLL++ partial-aggregates map-side and shuffles
  * kilobyte sketches (the q35/rollupApprox tension, and the reason q41's
  * sketch twin exists). An interactive session flips ONE conf and every
  * dashboard query in the workload — including SQL the engine's authors
  * never saw — takes the sketch path; audits and the driver-contract
  * oracle runs leave the flag off and keep exact semantics. This is the
  * aggregate-navigation pattern scoped to where Spark gives an exact
  * drop-in: same LongType result, same grouping, same filter clause.
  *
  * Scope guards: only DISTINCT `Count` is touched (plain counts and
  * every other aggregate pass through untouched); `resultId` is
  * preserved so downstream attribute references stay resolved; the
  * relative standard deviation comes from
  * `spark.graft.approxDistinct.rsd` (default 0.05).
  *
  * Multi-column `COUNT(DISTINCT a, b, …)` (r7/r8 verdict: previously a
  * prose-only exclusion) struct-packs the children before the sketch.
  * SQL's multi-argument COUNT DISTINCT drops a tuple when ANY argument
  * is NULL, while a struct containing nulls is itself non-null and
  * WOULD be counted — so the packed child is nulled out whenever any
  * original child is null, preserving exact-COUNT semantics
  * (spec-pinned in ApproxDistinctRewriteSpec against the exact result
  * on data with nulls in each position).
  *
  * Registered by [[GraftExtensions]] via `injectOptimizerRule`, so it
  * reaches SQL-first users through the same
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` as the
  * function surface. */
case class ApproxDistinctRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.get("spark.graft.approxDistinct", "false").toBoolean
  private def rsd: Double =
    spark.conf.get("spark.graft.approxDistinct.rsd", "0.05").toDouble

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(
                Count(children), _, true, _, _)
              if children.nonEmpty && children.forall(_.deterministic) =>
            val child: Expression =
              if (children.length == 1) children.head
              else {
                // tuple-null semantics: COUNT(DISTINCT a, b) skips rows
                // where ANY argument is null; struct(a, b) would not
                val tuple = CreateStruct(children)
                If(children.map(IsNull(_): Expression).reduce(Or(_, _)),
                  Literal.create(null, tuple.dataType), tuple)
              }
            ae.copy(
              aggregateFunction =
                HyperLogLogPlusPlus(child, relativeSD = rsd),
              isDistinct = false)
        }
    }
}
