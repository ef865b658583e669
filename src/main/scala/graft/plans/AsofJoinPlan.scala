package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Logical AS-OF JOIN — the whole-operator extension path ((c) in the
  * engine's preference order): a custom node + planner strategy +
  * physical operator, because no composition of built-in relational
  * operators expresses "for each left row, the single latest right row
  * at-or-before its time, per key" as an OPERATOR. The engine has long
  * shipped the composable formulation (q50: union + partitioned sort +
  * `last(_, ignoreNulls)` over the strictly-preceding frame); this node
  * gives the same point-in-time semantics a first-class plan shape that
  * [[AsofJoinStrategy]] lowers to [[graft.plans.AsofJoinExec]]'s
  * co-partitioned streaming merge.
  *
  * Semantics: LEFT OUTER as-of — every left row survives; right columns
  * null when no right row of the same key precedes it. `strict` selects
  * `rightTime < leftTime` (strictly earlier) vs `<=` (at-or-before),
  * mirroring DuckDB's `ASOF LEFT JOIN ON l.k = r.k AND l.t >/>= r.t`,
  * which is exactly the oracle the gated queries run against. Ties on
  * (rightKey, rightTime) are broken arbitrarily — callers wanting a
  * deterministic answer pre-aggregate the right side to unique
  * (key, time), the same discipline q50's oracle applies.
  *
  * Keys and times are resolved attributes of the respective child
  * (enforced by the [[graft.operators.Asof]] builder, which also
  * fresh-aliases the right side so a self-as-of cannot collide exprIds).
  */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    strict: Boolean) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy (injected via `SparkSessionExtensions
  * .injectPlannerStrategy` in [[graft.GraftExtensions]]): lowers
  * [[AsofJoinPlan]] to the physical merge. Catalyst's generic machinery
  * does the rest — EnsureRequirements co-partitions both children on the
  * keys and sorts them (key, time), exactly as it would for a
  * sort-merge join. */
class AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt, strict) =>
      AsofJoinExec(lk, rk, lt, rt, strict, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}
