package graft.functions

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Round-2 CleanHtml (String round-trip per row) — kept here verbatim as the
  * A/B baseline for the byte-path rewrite. */
case class CleanHtmlOld(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(HtmlUtils.clean(v.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.HtmlUtils.clean($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): CleanHtmlOld =
    copy(child = newChild)
}

object CleanHtmlBenchMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text").cache()
    docs.count() // materialize
    def time(name: String)(col: org.apache.spark.sql.Column): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        docs.select(length(col).as("n")).agg(sum("n")).collect()
        println(f"BENCH $name run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    val old = ColumnBridge.column(CleanHtmlOld(ColumnBridge.expression(col("text"))))
    time("old_string_path")(old)
    time("new_byte_path")(CleanHtml(col("text")))
    spark.stop()
  }
}
