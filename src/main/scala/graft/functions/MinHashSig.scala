package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Static MinHash kernel: Carter-Wegman permutations `(a·(h & p) + b) mod p`,
  * p = 2^61−1, a, b ∈ [1, p) (full field — see `Dedup.minhashSeeds` for why a
  * restricted multiplier range correlates the permutations and silently
  * loses near-dup pairs). Bit-identical to the DECIMAL(38,0) HOF formulation
  * in `Dedup.minhashSig` (parity spec); here the 128-bit a·x product is
  * reduced with `Math.multiplyHigh` + Mersenne folds (2^64 ≡ 8, 2^61 ≡ 1
  * mod p) — no BigDecimal per element. The HOF shape evaluates one
  * `transform` + `array_min` (two array allocations) PER PERMUTATION per
  * doc; this is one fused perms × shingles loop. */
object MinHashKernel {
  private final val Prime = 2305843009213693951L  // 2^61 − 1

  /** (a·x) mod (2^61−1) for a, x ∈ [0, p): full 128-bit product via
    * multiplyHigh (operands positive, so the signed high word IS the
    * unsigned one), folded with 2^64 ≡ 8 and 2^61 ≡ 1 (mod p). */
  private def mulmodP(a: Long, x: Long): Long = {
    val hi = Math.multiplyHigh(a, x)      // product = hi·2^64 + unsigned(lo)
    val lo = a * x
    var z = hi * 8 + (lo & Prime) + (lo >>> 61) // < 2^62: hi < 2^58
    z = (z & Prime) + (z >>> 61)
    if (z >= Prime) z - Prime else z
  }

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
            val m = mulmodP(as(k), h.getLong(i) & Prime) + bs(k) // < 2p, no overflow
            val v = if (m >= Prime) m - Prime else m
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
