package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

object MinHash60 {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** min over the array of: first 60 bits of md5(element) — numerically
    * identical to `conv(substring(md5(s),1,15),16,10)` (15 hex nibbles =
    * first 8 digest bytes big-endian, unsigned-shifted right by one
    * nibble), so the DuckDB oracle's value is reproduced bit-for-bit. */
  def compute(arr: ArrayData): Long = {
    val digest = md.get()
    var minV = Long.MaxValue
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      digest.reset()
      val h = digest.digest(arr.getUTF8String(i).getBytes)
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (h(b) & 0xffL); b += 1 }
      v = v >>> 4
      if (v < minV) minV = v
      i += 1
    }
    minV
  }
}

/** Native Catalyst expression: minimum 60-bit md5 hash over an
  * `array<string>` of shingles — the document-fingerprint hot loop as one
  * digest pass per element, replacing the interpreted higher-order chain
  * `array_min(transform(sh, s -> conv(substring(md5(s),1,15),16,10)))`
  * (hex-string round trip + per-element expression-tree walks). Empty
  * arrays yield Long.MaxValue; the shingle builder never produces them. */
case class MinHash60Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "min_hash60"

  override protected def nullSafeEval(input: Any): Any =
    MinHash60.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHash60Expr =
    copy(child = newChild)
}
