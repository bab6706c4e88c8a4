package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Literal, Round}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer-rule injection demo (SURVEY.md §4 optional stretch):
  * `round(round(e, s1), s2)` with s2 ≥ s1 is an identity over the inner
  * round — the outer call is dropped. Our query bank frequently composes
  * helper-rounded columns into further rounded expressions, so the rule
  * removes a real double-rounding pass from the hot loop.
  * Injected via GraftExtensions.injectOptimizerRule. */
object CollapseRedundantRound extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case outer @ Round(inner @ Round(_, Literal(s1: Int, IntegerType), _), Literal(s2: Int, IntegerType), _)
        // type guard: over DecimalType, Round computes a NEW precision/scale,
        // so dropping the outer call would change the plan schema
        if s2 >= s1 && outer.dataType == inner.dataType => inner
  }
}
