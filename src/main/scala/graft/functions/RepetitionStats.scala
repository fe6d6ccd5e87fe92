package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform

/** Static kernel for the Gopher-style repetition signals: one pass over the
  * token array computing [top-2-gram count, 2-gram total, duplicated-3-gram
  * count, 3-gram total] on xxhash64'd grams.
  *
  * Replaces the sort-based HOF formulation (sort both gram arrays, run-length
  * for the max count, sorted-neighbour equality for the dup count): counting
  * into an open hash map is O(tokens) per doc with no array materialization
  * or sort. Counts are identical to `xxhash64(concat_ws(' ', …))` grams —
  * same byte assembly (concat_ws skips nulls), same hash/seed — so the
  * fractions derived downstream are bit-equal short of a 2^-64 collision
  * (`VectorMathSpec` pins parity against the HOF form on the real corpus).
  */
object RepetitionKernel {
  /** gram hashes of width n over tb, counted; returns (maxCount, total,
    * total − singletons). */
  private def count(tb: Array[Array[Byte]], n: Int): (Long, Long, Long) = {
    val m = tb.length
    if (m < n) return (0L, 0L, 0L)
    val counts = new java.util.HashMap[java.lang.Long, Int]()
    var buf = new Array[Byte](128)
    val total = m - n + 1
    var i = 0
    while (i <= m - n) {
      // concat_ws(' ', …) byte assembly: null tokens are SKIPPED (no
      // separator emitted for them), mirroring the built-in exactly
      var len = 0
      var k = 0
      while (k < n) {
        val t = tb(i + k)
        if (t != null) len += (if (len > 0) 1 else 0) + t.length
        k += 1
      }
      if (buf.length < len) buf = new Array[Byte](math.max(len, buf.length * 2))
      var pos = 0
      k = 0
      while (k < n) {
        val t = tb(i + k)
        if (t != null) {
          if (pos > 0) { buf(pos) = ' '; pos += 1 }
          System.arraycopy(t, 0, buf, pos, t.length)
          pos += t.length
        }
        k += 1
      }
      val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, pos, 42L)
      counts.merge(h, 1, (a, b) => a + b)
      i += 1
    }
    var maxC = 0L
    var singles = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c > maxC) maxC = c
      if (c == 1) singles += 1
    }
    (maxC, total.toLong, total.toLong - singles)
  }

  def stats(toks: ArrayData): ArrayData = {
    val m = toks.numElements()
    val tb = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      tb(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i).getBytes
      i += 1
    }
    val (top2, tot2, _) = count(tb, 2)
    val (_, tot3, dup3) = count(tb, 3)
    new GenericArrayData(Array[Any](top2, tot2, dup3, tot3))
  }
}

/** Codegen'd repetition-signal counts (SURVEY.md §2.10):
  * `repetition_stats(toks)` = [top_2gram_count, 2gram_total,
  * dup_3gram_count, 3gram_total]. */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"repetition_stats needs array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    RepetitionKernel.stats(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionKernel.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)

  override def prettyName: String = "repetition_stats"
}

object RepetitionStats {
  def apply(c: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(c)))
}
