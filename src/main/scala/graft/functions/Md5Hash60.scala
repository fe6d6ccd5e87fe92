package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable 60-bit md5 base hash (see `Dedup.md5Hash60`): the value of
  * the first 15 hex chars of md5(s), i.e. the big-endian first 8 digest bytes
  * shifted right 4. Bit-identical to the SQL form
  * `conv(substring(md5(s),1,15),16,10)` (parity spec) without the hex-string
  * render + base-16 re-parse per value; DuckDB computes the same value as
  * `('0x'||substr(md5(s),1,15))::BIGINT`, which is what makes the `_md5`
  * oracle-twin pipelines hash-comparable across engines. */
object Md5Kernel {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash60(s: UTF8String): Long = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}

/** Codegen'd scalar form: string → 60-bit md5 hash. */
case class Md5Hash60(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"md5_hash60 needs string, got $t")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    Md5Kernel.hash60(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Kernel.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)

  override def prettyName: String = "md5_hash60"
}

object Md5Hash60 {
  def apply(c: Column): Column =
    ColumnBridge.column(Md5Hash60(ColumnBridge.expression(c)))
}

/** SimHash votes over the md5-60 base hash — the portable-hash sibling of
  * `SimHash64Kernel`: 60 bit positions (the hash is 60-bit; bits 60..63 can
  * never win a vote), same distinct-token + vote-sum math, bit-identical to
  * the HOF form `Dedup.simhashMd5Expr` (parity spec). */
object SimHashMd5Kernel {
  def simhash(toks: ArrayData): Long = {
    val n = toks.numElements()
    val votes = new Array[Long](60)
    val seen = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        if (seen.add(t)) {
          val h = Md5Kernel.hash60(t)
          var b = 0
          while (b < 60) {
            votes(b) += (if (((h >>> b) & 1L) == 1L) 1L else -1L)
            b += 1
          }
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Codegen'd md5-60 SimHash over a token array (the `_md5` oracle twin's
  * production-shaped kernel). */
case class SimHashMd5(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash_md5 needs array<string>, got $t")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    SimHashMd5Kernel.simhash(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashMd5Kernel.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5 =
    copy(child = newChild)

  override def prettyName: String = "simhash_md5"
}

object SimHashMd5 {
  def apply(c: Column): Column =
    ColumnBridge.column(SimHashMd5(ColumnBridge.expression(c)))
}
