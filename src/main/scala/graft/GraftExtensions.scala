package graft

import graft.functions.CleanHtml
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimization law for graft's own expression: clean_html is
  * idempotent on its output (property-tested in HtmlUtilsSpec), so nested
  * applications collapse — one string traversal instead of two on a 100 TB
  * text column when transform layers stack. */
object CollapseCleanHtml extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CleanHtml(inner @ CleanHtml(_)) => inner
    }
}

/** SparkSessionExtensions entry point: registers graft's custom expressions
  * as SQL functions (so `spark.sql("SELECT clean_html(col) ...")` works the
  * same as the Column API) and graft's optimizer rules. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("clean_html"),
      new ExpressionInfo(classOf[CleanHtml].getName, "clean_html"),
      (children: Seq[Expression]) => CleanHtml(children.head)))
    e.injectOptimizerRule(_ => CollapseCleanHtml)
  }
}
