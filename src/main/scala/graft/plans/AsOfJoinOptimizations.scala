package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer support for the custom [[AsOfJoin]] node. Catalyst's built-in
  * predicate pushdown and column pruning stop at operators they don't
  * know, so without this rule a filter above an as-of join is evaluated
  * AFTER the join's shuffle and the scans read every column — precisely
  * the costs that matter at 100 TB. Injected via
  * `injectOptimizerRule` (GraftExtensions), it runs inside the operator
  * optimization fixed point, so the Filters/Projects it plants are then
  * carried all the way into the parquet scans by the built-in rules.
  *
  * Two rewrites, both semantics-preserving for the left-outer as-of:
  *  - deterministic predicates referencing only LEFT attributes move
  *    below the join (dropping a left row never affects any other row's
  *    match). Right-side predicates must stay above: they would turn
  *    unmatched nulls into dropped rows and change which right row is
  *    "latest".
  *  - a Project above the join prunes each child to the columns the
  *    projection references plus the join's own keys and times.
  */
object AsOfJoinOptimizations extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, j: AsOfJoin) =>
      val (push, keep) = conjuncts(cond).partition(c =>
        c.deterministic && c.references.subsetOf(j.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }

    case p @ Project(projectList, j: AsOfJoin) =>
      val required = AttributeSet(projectList.flatMap(_.references)) ++
        AttributeSet(j.leftKeys) ++ AttributeSet(j.rightKeys) ++
        AttributeSet(Seq(j.leftTime, j.rightTime))
      def prune(child: LogicalPlan): LogicalPlan = {
        val kept = child.output.filter(required.contains)
        if (kept.size < child.output.size) Project(kept, child) else child
      }
      val (nl, nr) = (prune(j.left), prune(j.right))
      if ((nl eq j.left) && (nr eq j.right)) p
      else p.copy(child = j.copy(left = nl, right = nr))
  }
}
