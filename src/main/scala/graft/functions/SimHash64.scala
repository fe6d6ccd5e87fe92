package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static SimHash kernel. Bit-identical to the higher-order formulation in
  * `Dedup.simhashExpr` (pinned by a parity spec): per DISTINCT token,
  * h = xxhash64(token, seed 42 — Spark's xxhash64 expression); bit i votes
  * +1 if (h >> i) & 1 else −1; output bit i set iff its vote sum > 0. The
  * HOF version allocates two 64-element arrays per TOKEN (zip_with over the
  * vote vector); this is one fused loop with a 64-long vote array per ROW. */
object SimHash64Kernel {
  def simhash(toks: ArrayData): Long = {
    val n = toks.numElements()
    val votes = new Array[Long](64)
    val seen = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        if (seen.add(t)) {
          val h = XXH64.hashUTF8String(t, 42L)
          var b = 0
          while (b < 64) {
            votes(b) += (if (((h >>> b) & 1L) == 1L) 1L else -1L)
            b += 1
          }
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Codegen'd 64-bit SimHash over a token array (SURVEY.md §2.10: native
  * Expression where the higher-order shape is the measured bottleneck). */
case class SimHash64(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 needs array<string>, got $t")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    SimHash64Kernel.simhash(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64Kernel.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  def apply(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))
}
