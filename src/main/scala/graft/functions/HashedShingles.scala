package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

object HashedShingles {
  /** FNV-1a 64-bit over a word's UTF-8 bytes — any good 64-bit hash works
    * here (set identity is what matters; Jaccard over hashes equals
    * Jaccard over strings modulo ~2^-64 collisions). */
  private def wordHash(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Sorted distinct composite hashes of the k-word shingles of `words` —
    * same set semantics as hashing the space-joined shingle strings
    * (order-sensitive fmix chain over the word hashes), without building a
    * single shingle string. Documents shorter than k yield one composite
    * of all words, mirroring TextOps.wordShingles. */
  def compute(words: ArrayData, k: Int): ArrayData = {
    val n = words.numElements()
    val m = math.max(1, n - k + 1)
    val wh = new Array[Long](n)
    var i = 0
    while (i < n) { wh(i) = wordHash(words.getUTF8String(i).getBytes); i += 1 }
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      var acc = 0x9e3779b97f4a7c15L
      var j = s
      val e = math.min(s + k, n)
      while (j < e) { acc = Lsh.fmix64(acc ^ wh(j)); j += 1 }
      out(s) = acc
      s += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    var r = 0
    while (r < m) {
      if (r == 0 || out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }
}

/** Native Catalyst expression: `hashed_shingles(words, k)` — the shingle
  * set of a tokenized document as sorted distinct 64-bit hashes, fused in
  * one JVM loop. Replaces the interpreted higher-order chain
  * `array_sort(transform(array_distinct(transform(sequence…, concat_ws
  * slice)), xxhash64))` that dominated the dedup operators' scan time. */
case class HashedShinglesExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, int), got (${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "hashed_shingles"

  override protected def nullSafeEval(words: Any, k: Any): Any =
    HashedShingles.compute(words.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, k) => s"graft.functions.HashedShingles.compute($w, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HashedShinglesExpr =
    copy(left = newLeft, right = newRight)
}
