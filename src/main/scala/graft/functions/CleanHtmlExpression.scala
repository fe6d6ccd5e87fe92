package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the reference's HTML-strip transform (F1 in
  * SURVEY.md §2.8; /root/reference/main.py:104-122). A codegen'd expression —
  * not a Scala UDF — so projections using it stay inside whole-stage codegen
  * (no encoder round-trip per row on a 100 TB text column).
  */
case class CleanHtml(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    HtmlUtils.cleanUtf8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // byte-level scan; ASCII-clean rows (the corpus-dominant case) return
    // the input UTF8String untouched — see HtmlUtils.cleanUtf8
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HtmlUtils.cleanUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): CleanHtml =
    copy(child = newChild)

  override def prettyName: String = "clean_html"
}

object CleanHtml {
  /** Column-API form: `clean_html($"description")`. */
  def apply(c: Column): Column =
    ColumnBridge.column(CleanHtml(ColumnBridge.expression(c)))
}
