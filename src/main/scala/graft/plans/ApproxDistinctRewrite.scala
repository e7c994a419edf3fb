package graft.plans

import org.apache.spark.sql.catalyst.expressions.{HllSketchEstimate, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HllSketchAgg}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}

/** Opt-in Catalyst optimizer rule: rewrite exact `count(DISTINCT x)` to a
  * DataSketches HLL sketch + estimate when the session sets
  * `graft.approxDistinct.enabled=true` (default off — the correctness
  * surface always runs exact).
  *
  * Why a RULE and not an API: at 100 TB, exact distinct is the single most
  * shuffle-hungry aggregate (every distinct value crosses the wire; with
  * other aggregates alongside it also triggers an `Expand`, multiplying
  * scan output). Pipelines often can't edit every downstream query that
  * does `countDistinct` — flipping one session flag converts them all to a
  * fixed-size mergeable sketch with ~2% error (lgConfigK via
  * `graft.approxDistinct.lgConfigK`, default 12), which is exactly how
  * warehouse "approximate mode" switches work. The rewrite happens in the
  * logical optimizer, so it composes with grouping, filters, and
  * partial aggregation like any native aggregate.
  *
  * Scope guard: only plain single-argument, unfiltered count-distinct over
  * sketch-supported types is rewritten; anything else (FILTER clauses,
  * multi-arg counts, decimals) keeps exact semantics. Empty-input edge:
  * global count-distinct of zero rows returns 0 exactly; the sketch path
  * returns 0 as well (DataSketches empty sketch estimates 0).
  *
  * Installed by [[GraftExtensions]] via `injectOptimizerRule` (builder
  * path) or `experimental.extraOptimizations` (live-session path). The
  * rule is idempotent — rewritten plans contain no distinct Count, so the
  * fixed-point optimizer batch stabilizes immediately.
  */
case class ApproxDistinctRewrite() extends Rule[LogicalPlan] {

  private def supported(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | StringType | BinaryType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("graft.approxDistinct.enabled", "false").toBoolean) plan
    else {
      val lgK = conf.getConfString("graft.approxDistinct.lgConfigK", "12").toInt
      plan.transformUp {
        case agg: Aggregate =>
          agg.transformExpressionsUp {
            case ae @ AggregateExpression(Count(Seq(child)), _, true, None, _)
                if supported(child.dataType) =>
              HllSketchEstimate(
                ae.copy(aggregateFunction = new HllSketchAgg(child, Literal(lgK)),
                  isDistinct = false))
          }
      }
    }
}
