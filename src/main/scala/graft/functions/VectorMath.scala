package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Static vector kernels shared by interpreted eval and generated code.
  * Semantics mirror `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  * 0.0d, (acc, v) -> acc + v)` EXACTLY — same left-to-right double
  * accumulation (bit-identical sums, so oracle hashes cannot move), null on
  * length mismatch or any null element (zip_with padding/null propagation). */
object VectorMath {
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

/** Codegen'd dot product over float/double array columns — the hot kernel of
  * every similarity query (one dot per candidate PAIR). The higher-order
  * `zip_with` formulation allocates an intermediate 64-element array per
  * evaluation; this expression is a bare fused loop (SURVEY.md §2.10:
  * compose built-ins first, drop to a native Expression when the built-in
  * shape is the measured bottleneck). */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {
  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"array_dot needs array<float|double>, got $t")
  }
  private lazy val lFloat = elemIsFloat(left)
  private lazy val rFloat = elemIsFloat(right)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lFloat, rFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotResult")
      s"""
         |java.lang.Double $r = graft.functions.VectorMath.dot($a, $b, $lFloat, $rFloat);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "array_dot"
}

object ArrayDot {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
