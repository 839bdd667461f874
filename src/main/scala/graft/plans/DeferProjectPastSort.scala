package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: pull a deterministic, expensive projection ABOVE a global
  * sort whose keys don't depend on it.
  *
  * `Sort(global, Project(expensive, child))` plans as a range exchange whose
  * boundary-sampling pass executes the entire child — the expensive
  * projection runs TWICE (see `graft.query.RangeSort` for the manual
  * restatement). When every sort key resolves against `child`'s own output,
  * the projection is row-wise 1:1 and order-preserving, so
  * `Project(expensive, Sort(global, child))` is semantically identical: the
  * sampling pass now sees only `child`, and the projection runs once, after
  * the exchange.
  *
  * Trade-off, stated: deferring makes the exchange carry the projection's
  * INPUTS instead of its outputs. For reducer-shaped projections over wide
  * blobs (100 TB of `binary` → one scalar) pre-reduce explicitly and skip the
  * sort-side savings; for the compute-shaped projections this engine runs
  * (per-row conversion, hashing, stats), input width ≈ output width and the
  * single execution wins. The rule therefore fires only when the projection
  * contains at least one non-trivial expression — pure column/literal
  * reshuffles stay put.
  *
  * Safety gates: global sorts only (local sorts don't sample), deterministic
  * projections only, and every sort order must reference only `child`
  * attributes (a sort on a computed alias cannot be deferred).
  *
  * Injection point matters: this rewrite is the exact inverse of
  * `CollapseProject`'s Project-Sort-Project case, so inside the operator
  * optimization FIXPOINT batches the two rules ping-pong until the
  * 100-iteration cap (and hard-fail under `spark.testing`). It is therefore
  * injected via `injectPreCBORule` — a `Once` batch that runs AFTER the
  * fixpoint has settled, where the plan arrives fully collapsed/pruned and
  * the only later CollapseProject pass (the `RewriteSubquery` batch) cannot
  * re-merge it: under the settled Sort sits either a non-Project child (the
  * P-S-P case doesn't match) or a projection the fixpoint already deemed
  * non-collapsible.
  */
object DeferProjectPastSort extends Rule[LogicalPlan] {

  private def trivial(e: Expression): Boolean = e match {
    case _: Attribute | _: Literal => true
    case a: Alias => trivial(a.child)
    case c: Cast => trivial(c.child)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case s @ Sort(order, true, p @ Project(projectList, child), _)
        if p.deterministic &&
          projectList.exists(e => !trivial(e)) &&
          order.forall(_.references.subsetOf(child.outputSet)) =>
      Project(projectList, s.copy(child = child))
  }
}

/** Registers the graft optimizer rules AND the SQL spellings of the native
  * expression family ([[graft.functions.GraftFunctionRegistry]]); enable
  * with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. [[RollupRouting]] is
  * inert until its `spark.graft.rollup.*` confs are set. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPreCBORule(_ => DeferProjectPastSort)
    ext.injectPreCBORule(RollupRouting)
    graft.functions.GraftFunctionRegistry.register(ext)
  }
}
