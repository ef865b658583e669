package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

object Lsh {
  /** MurmurHash3's 64-bit finalizer — a full-avalanche bijection. Wrapping
    * multiplication is fine here: this is JVM code, not a Catalyst
    * arithmetic op, so ANSI overflow checking does not apply. */
  def fmix64(v: Long): Long = {
    var x = v
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** bands×rows minhashes over a doc's hashed shingle set, folded into one
    * band key per band, in a single fused pass: for each shingle hash h and
    * permutation k, the permuted value is fmix64(h ^ seed_k); band key b
    * mixes its `rows` minima. O(|shingles|·bands·rows) long ops, zero
    * allocation beyond the two small arrays. */
  def bandKeys(sh: ArrayData, bands: Int, rows: Int): ArrayData = {
    val n = bands * rows
    val mins = Array.fill(n)(Long.MaxValue)
    val m = sh.numElements()
    var i = 0
    while (i < m) {
      val h = sh.getLong(i)
      var k = 0
      while (k < n) {
        val v = fmix64(h ^ (k * 0x9e3779b97f4a7c15L + 0xbf58476d1ce4e5b9L))
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = b.toLong
      var r = 0
      while (r < rows) { acc = fmix64(acc ^ mins(b * rows + r)); r += 1 }
      keys(b) = acc
      b += 1
    }
    new GenericArrayData(keys)
  }
}

/** Native Catalyst expression: LSH band keys of a hashed shingle set
  * (`array<bigint>`) — the MinHash signature and banding fused into one
  * loop. Replaces: explode(shingles) → 128 seeded-hash min aggregations →
  * band-key mixing (three operators, one shuffle) with a single projection
  * expression. The signature family differs from the aggregation path's
  * (fmix64 vs xxhash64 seeds) — semantically free, because candidates are
  * exact-verified downstream; only banding recall matters, and any
  * full-avalanche family provides it. */
case class LshBandKeysExpr(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "lsh_band_keys"

  override protected def nullSafeEval(input: Any): Any =
    Lsh.bandKeys(input.asInstanceOf[ArrayData], bands, rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Lsh.bandKeys($c, $bands, $rows)")

  override protected def withNewChildInternal(newChild: Expression): LshBandKeysExpr =
    copy(child = newChild)
}
