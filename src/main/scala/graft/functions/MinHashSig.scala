package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Static MinHash kernel: Carter-Wegman permutations `(a·(h & 2^31−1) + b)
  * mod (2^61−1)` over pre-hashed shingles, min per permutation. Bit-identical
  * to the HOF formulation in `Dedup.minhashSig` (parity spec): products stay
  * under 2^62 so `%` semantics match SQL's remainder on positives. The HOF
  * shape evaluates one `transform` + `array_min` (two array allocations) PER
  * PERMUTATION per doc; this is one fused perms × shingles loop. */
object MinHashKernel {
  private final val Mask = 2147483647L            // 2^31 − 1
  private final val Prime = 2305843009213693951L  // 2^61 − 1

  def sig(h: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val n = h.numElements()
    val out = new Array[Any](as.length)
    if (n > 0) {
      var k = 0
      while (k < as.length) {
        var min = Long.MaxValue
        var i = 0
        while (i < n) {
          if (!h.isNullAt(i)) {
            val v = (as(k) * (h.getLong(i) & Mask) + bs(k)) % Prime
            if (v < min) min = v
          }
          i += 1
        }
        out(k) = min
        k += 1
      }
    } // n == 0: array of nulls, mirroring array_min(empty) = null per perm
    new GenericArrayData(out)
  }
}

/** Codegen'd MinHash signature over an array<long> of shingle hashes
  * (SURVEY.md §2.10: native Expression where the measured bottleneck is the
  * built-in composition). Seeds are constructor literals, so the plan stays
  * deterministic exactly like the generated-SQL form it replaces. */
case class MinHashSig(child: Expression, as: Array[Long], bs: Array[Long])
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig needs array<bigint>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    MinHashKernel.sig(v.asInstanceOf[ArrayData], as, bs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashKernel.sig($c, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  def apply(c: Column, as: Array[Long], bs: Array[Long]): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c), as, bs))
}
