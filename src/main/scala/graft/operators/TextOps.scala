package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Shared text machinery for the LLM-data-pipeline operators (dedup,
  * fingerprinting, quality scoring) over the `documents` table.
  *
  * Everything here is built from codegen'd built-in expressions — no UDFs —
  * so the per-document work (shingling, hashing, ratio math) stays inside
  * whole-stage codegen and never leaves the scan's task. Higher-order
  * functions (`transform`/`filter`/`aggregate`) iterate arrays per row
  * without exploding rows, so a 100 TB corpus pays zero shuffle for
  * per-document features.
  */
object TextOps {

  /** Whitespace tokenization (leading/trailing ws trimmed). */
  def words(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct k-word shingles; documents shorter than k yield one shingle of
    * all their words (never an empty set — keeps Jaccard well-defined). */
  def wordShingles(w: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(0), greatest(size(w) - k, lit(0))),
      i => concat_ws(" ", slice(w, i + lit(1), lit(k)))))

  /** 60-bit stable hash: the low 15 hex digits of md5, as a non-negative
    * LongType. Chosen because it is reproducible in ANY engine with an md5
    * function (the DuckDB oracle computes the identical value); 60 bits keeps
    * it inside a signed 64-bit integer in engines without unsigned types. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** JVM twin of [[hash60]] (and the oracles' md5 incantation) — for
    * plan-build-time literals (q162's ring) and spec-side ground truth. */
  def hash60Jvm(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Salted content-stable ordering hash over doc_id — the one definition
    * of the `hash60(salt || doc_id)` idiom the shard/pack/sample operators
    * and their oracles' md5 incantations must all stay bit-identical to.
    * Distinct salts give independent orders from the same ids. */
  def saltedOrd(salt: String): Column =
    hash60(concat(lit(salt), col("doc_id").cast(org.apache.spark.sql.types.StringType)))

  /** Element-wise sum of an integer array column via left fold. */
  def intArraySum(arr: Column): Column =
    aggregate(arr, lit(0), (acc, x) => acc + x)

  /** Occurrence count of `w`'s elements that appear in a fixed vocabulary. */
  def vocabHits(w: Column, vocab: Seq[String]): Column =
    size(filter(w, x => array_contains(array(vocab.map(lit): _*), x)))
}
