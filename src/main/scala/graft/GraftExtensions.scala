package graft

import graft.functions.CleanHtml
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's custom expressions
  * as SQL functions, so `spark.sql("SELECT clean_html(col) ...")` works the
  * same as the Column API. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("clean_html"),
      new ExpressionInfo(classOf[CleanHtml].getName, "clean_html"),
      (children: Seq[Expression]) => CleanHtml(children.head)))
  }
}
