package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

object MinMd5Shingle60 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** min 60-bit md5 over the space-joined k-word shingles of `words`,
    * building each shingle's bytes directly (no per-shingle UTF8String /
    * array materialization). Identical value to computing
    * [[MinHash60.compute]] over [[graft.operators.TextOps.wordShingles]] —
    * md5 input bytes are the same UTF-8 "w1 w2 … wk" strings; dedup before
    * min is irrelevant to the minimum. */
  def compute(words: ArrayData, k: Int): Long = {
    val digest = md.get()
    val n = words.numElements()
    val m = math.max(1, n - k + 1)
    val wb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { wb(i) = words.getUTF8String(i).getBytes; i += 1 }
    var minV = Long.MaxValue
    var s = 0
    while (s < m) {
      digest.reset()
      var j = s
      val e = math.min(s + k, n)
      while (j < e) {
        if (j > s) digest.update(' '.toByte)
        digest.update(wb(j))
        j += 1
      }
      val h = digest.digest()
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (h(b) & 0xffL); b += 1 }
      v = v >>> 4
      if (v < minV) minV = v
      s += 1
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

/** Native Catalyst expression: `min_md5_shingle60(words, k)` — fuses the
  * k-word shingle construction INTO the digest loop (shingle bytes are
  * streamed into the MessageDigest word by word), so the fingerprint needs
  * neither shingle strings nor an intermediate array. Same value as
  * min_hash60 over the built shingle array. */
case class MinMd5Shingle60Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), org.apache.spark.sql.types.IntegerType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, int), got (${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "min_md5_shingle60"

  override protected def nullSafeEval(words: Any, k: Any): Any =
    MinMd5Shingle60.compute(words.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, k) => s"graft.functions.MinMd5Shingle60.compute($w, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinMd5Shingle60Expr =
    copy(left = newLeft, right = newRight)
}
