package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform

/** Static kernel: DISTINCT xxhash64 values of the n-word shingles of a token
  * array, first-occurrence order — value-equal to the composed form
  * `transform(array_distinct(<n-gram concat_ws>), sh -> xxhash64(sh))`
  * (parity spec): the shingle bytes are assembled in a reused buffer and
  * hashed with the same algorithm/seed Spark's xxhash64 uses, so no shingle
  * STRING is ever allocated. (Distinctness is by hash rather than by string;
  * divergence needs a 2^-64 collision — the same contract as every hashed
  * set-op in the dedup tier.) */
object ShingleKernel {
  def hashes(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val tb = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      tb(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i).getBytes
      i += 1
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Any](m)
    var buf = new Array[Byte](128)
    i = 0
    while (i <= m - n) {
      var len = n - 1 // separators
      var ok = true
      var k = 0
      while (k < n) {
        if (tb(i + k) == null) ok = false else len += tb(i + k).length
        k += 1
      }
      if (ok) {
        if (buf.length < len) buf = new Array[Byte](math.max(len, buf.length * 2))
        var pos = 0
        k = 0
        while (k < n) {
          val t = tb(i + k)
          System.arraycopy(t, 0, buf, pos, t.length)
          pos += t.length
          if (k < n - 1) { buf(pos) = ' '; pos += 1 }
          k += 1
        }
        val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 42L)
        if (seen.add(h)) out += h
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Codegen'd fused shingle hashing (SURVEY.md §2.10): the composed
  * shingle-string pipeline paid one concat_ws allocation per shingle plus a
  * string array_distinct and a per-string rehash; this is one buffer-reusing
  * loop per row. */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingle_hashes needs array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    ShingleKernel.hashes(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernel.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {
  def apply(c: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(c), n))
}
