package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Static kernel shared by interpreted eval and generated code. Semantics
  * mirror the composed Catalyst expression it replaced BIT-FOR-BIT so the
  * dynamically generated codebook-literal oracles cannot move:
  *
  *   least(over codes: struct(round(dot(xs, cv) * -2.0 + dot(xs, xs) + cc, 6),
  *                            code)).code    per subspace
  *
  * i.e. per code the distance is ((dot * -2.0) + xx) + cc in that exact
  * association, dot/xx are left-to-right double folds (the VectorMath.dot
  * order), rounding is Spark's double ROUND (BigDecimal.valueOf → HALF_UP,
  * NaN/Inf passed through), and ties break toward the ascending code id
  * (strict `<` keeps the earlier candidate, exactly like `least` on the
  * (dist, code) struct). */
object PqKernel {
  /** `subStart` indexes the flattened codeword inventory per subspace
    * (length m+1): subspace `sub` owns codewords subStart(sub) until
    * subStart(sub+1), with LOCAL code ids 0..count-1. Sizes may differ per
    * subspace — k-means drops empty clusters on duplicate-heavy data (seen
    * on the 50× rehearsal corpus), so a fitted book is not necessarily
    * rectangular. */
  def assign(vec: ArrayData, isFloat: Boolean, books: Array[Double],
             cnorm2: Array[Double], subStart: Array[Int], subDim: Int): ArrayData = {
    val m = subStart.length - 1
    val n = vec.numElements()
    if (n != m * subDim) return null
    val out = new Array[Long](m)
    var sub = 0
    while (sub < m) {
      val off = sub * subDim
      var i = 0
      while (i < subDim) {
        if (vec.isNullAt(off + i)) return null
        i += 1
      }
      var xx = 0.0
      i = 0
      while (i < subDim) {
        val x = if (isFloat) vec.getFloat(off + i).toDouble else vec.getDouble(off + i)
        xx += x * x
        i += 1
      }
      var best = 0L
      var bestD = 0.0
      var first = true
      var w = subStart(sub)
      while (w < subStart(sub + 1)) {
        val boff = w * subDim
        var d = 0.0
        i = 0
        while (i < subDim) {
          val x = if (isFloat) vec.getFloat(off + i).toDouble else vec.getDouble(off + i)
          d += x * books(boff + i)
          i += 1
        }
        var dist = d * -2.0 + xx
        dist += cnorm2(w)
        val r =
          if (java.lang.Double.isNaN(dist) || java.lang.Double.isInfinite(dist)) dist
          else java.math.BigDecimal.valueOf(dist)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        if (first || r < bestD) {
          bestD = r; best = (w - subStart(sub)).toLong; first = false
        }
        w += 1
      }
      out(sub) = best
      sub += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** Product-quantization code assignment as ONE fused codegen expression:
  * vec (array<float|double>, length m·subDim) → array<bigint> of m code
  * ids against the fitted codebooks. The composed form — m× `least` over
  * ksub `struct(round(ArrayDot…))` candidates, 256 struct constructions
  * per row — exceeds janino's method budget at k=32 and silently drops the
  * whole-stage-codegen pipeline to interpreted eval (observed on the 50×
  * rehearsal build); this kernel is a bare loop the JIT can vectorize, and
  * keeps the build projection inside codegen. Codebooks ride along as a
  * broadcast-style reference object, not literals, so the generated source
  * stays O(1) in ksub. */
case class PqAssign(child: Expression, books: Array[Double],
                    cnorm2: Array[Double], subStart: Array[Int], subDim: Int)
  extends UnaryExpression {

  require(books.length == cnorm2.length * subDim &&
    subStart.length >= 2 && subStart.head == 0 && subStart.last == cnorm2.length,
    s"codebook shape mismatch: ${books.length} centroid elems, " +
      s"${cnorm2.length} norms, offsets ${subStart.toSeq}")

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"pq_assign needs array<float|double>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    PqKernel.assign(v.asInstanceOf[ArrayData], isFloat, books, cnorm2, subStart, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val booksRef = ctx.addReferenceObj("pqBooks", books, "double[]")
      val cnRef = ctx.addReferenceObj("pqCnorm2", cnorm2, "double[]")
      val offRef = ctx.addReferenceObj("pqSubStart", subStart, "int[]")
      val r = ctx.freshName("pqCodes")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.PqKernel.assign($c, $isFloat, $booksRef, $cnRef, $offRef, $subDim);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqAssign =
    copy(child = newChild)

  override def prettyName: String = "pq_assign"
}

object PqAssign {
  /** Column-API form over the fitted (sub, code, centroid, cnorm2) books.
    * Codes must be contiguous 0..kᵢ−1 within each subspace (they are —
    * clusterCenters.zipWithIndex), but kᵢ may differ per subspace. */
  def apply(c: Column, books: Seq[(Int, Long, Array[Double], Double)],
            m: Int, subDim: Int): Column = {
    val sorted = books.sortBy(b => (b._1, b._2))
    val counts = (0 until m).map(sub => sorted.count(_._1 == sub))
    sorted.groupBy(_._1).foreach { case (sub, ws) =>
      require(ws.map(_._2).sorted == (0L until ws.length.toLong),
        s"non-contiguous code ids in subspace $sub")
    }
    val subStart = counts.scanLeft(0)(_ + _).toArray
    ColumnBridge.column(PqAssign(ColumnBridge.expression(c),
      sorted.flatMap(_._3).toArray, sorted.map(_._4).toArray, subStart, subDim))
  }
}
