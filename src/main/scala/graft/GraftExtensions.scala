package graft

import graft.functions.CleanHtml
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's custom expressions
  * as SQL functions (so `spark.sql("SELECT clean_html(col) ...")` works the
  * same as the Column API). Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  *
  * NOTE deliberately NO optimizer rule collapsing nested clean_html calls:
  * clean_html (reference semantics, /root/reference/main.py:104-122) entity-
  * unescapes BEFORE tag-stripping, so it is not idempotent — 'Tom &amp;amp;
  * Jerry' unescapes once per application, and double-escaped tags
  * ('&amp;lt;b&amp;gt;') materialize into strippable tags on the second pass.
  * Collapsing clean_html(clean_html(x)) would silently change results for
  * stacked transforms (HtmlUtilsSpec pins the counterexamples).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("clean_html"),
      new ExpressionInfo(classOf[CleanHtml].getName, "clean_html"),
      (children: Seq[Expression]) => CleanHtml(children.head)))
  }
}
