package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object CdcCuts {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def seqLen(b: Byte): Int =
    if ((b & 0x80) == 0) 1
    else if ((b & 0xE0) == 0xC0) 2
    else if ((b & 0xF0) == 0xE0) 3
    else if ((b & 0xF8) == 0xF0) 4
    else 1 // continuation/invalid byte: advance one (UTF8String is valid UTF-8)

  /** Content-defined cut positions of `text` (character indices, including
    * the 0 and length(text) sentinels, strictly ascending): a cut lands
    * after character i whenever the 60-bit md5 of the last `w` characters
    * (the hash60 idiom: first 15 hex nibbles of md5, i.e. first 8 digest
    * bytes unsigned-shifted right a nibble) ≡ 0 mod `mask`. Identical
    * value to the composable chain
    * `array_sort(array_distinct(concat(array(0), filter(sequence(w, len),
    * i -> pmod(hash60(substr(text, i-w+1, w)), mask) = 0), array(len))))`
    * — md5 input bytes are the same UTF-8 window slices, taken here
    * straight from the document's byte buffer via a one-pass character
    * offset table instead of per-position substring materialization. */
  def compute(text: UTF8String, w: Int, mask: Int): ArrayData = {
    val bytes = text.getBytes
    var nChars = 0
    var p = 0
    while (p < bytes.length) { p += seqLen(bytes(p)); nChars += 1 }
    val off = new Array[Int](nChars + 1)
    var i = 0
    p = 0
    while (p < bytes.length) { off(i) = p; p += seqLen(bytes(p)); i += 1 }
    off(nChars) = bytes.length
    val out = scala.collection.mutable.ArrayBuffer[Long](0L)
    if (nChars >= w) {
      val digest = md.get()
      var pos = w // 1-based index of the window's LAST character
      while (pos <= nChars) {
        digest.reset()
        digest.update(bytes, off(pos - w), off(pos) - off(pos - w))
        val h = digest.digest()
        var v = 0L
        var b = 0
        while (b < 8) { v = (v << 8) | (h(b) & 0xffL); b += 1 }
        v = v >>> 4
        if (v % mask == 0 && out.last != pos.toLong) out += pos.toLong
        pos += 1
      }
    }
    if (out.last != nChars.toLong) out += nChars.toLong
    new GenericArrayData(out.toArray)
  }
}

/** Native Catalyst expression: `cdc_cuts(text, w, mask)` — the q110
  * content-defined chunk boundary scan fused to one pass over the
  * document's UTF-8 bytes (one offset table + one small digest per
  * position), replacing the interpreted
  * `filter(sequence(...), i -> pmod(hash60(substr(text, ...)), mask))`
  * chain whose per-position substring seeks are O(len) each. */
case class CdcCutsExpr(child: Expression, w: Int, mask: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "cdc_cuts"

  override protected def nullSafeEval(input: Any): Any =
    CdcCuts.compute(input.asInstanceOf[UTF8String], w, mask)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcCuts.compute($c, $w, $mask)")

  override protected def withNewChildInternal(newChild: Expression): CdcCutsExpr =
    copy(child = newChild)
}
