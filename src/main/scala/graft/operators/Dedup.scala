package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators (LLM-data-pipeline extension family 1).
  *
  * Three tiers, all shuffle-bounded — never an all-pairs cross join:
  *  - exact: hash-groupBy on a normalized content digest (one keyed shuffle);
  *  - MinHash/LSH near-dup: signature → band buckets → equi-join within
  *    buckets → exact-Jaccard verification of the (tiny) candidate set;
  *  - blocked pairwise: equi-join on a blocking key (here language +
  *    adjacent length buckets, the sorted-neighborhood pattern) for
  *    corpora where a domain key bounds the comparison set.
  *
  * At 100 TB the candidate-pair count, not the corpus size, is the cost
  * driver; banding/blocking keeps it near-linear while the verification
  * step keeps the output exact for everything the bands surface.
  */
object Dedup {

  /** Exact dedup groups: md5 over whitespace-normalized lowercased text.
    * Returns one row per distinct content with its copy count and canonical
    * (minimum) id — the classic "keep first, count the rest" shape. */
  def exactGroups(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val norm = md5(lower(regexp_replace(trim(text), "\\s+", " ")))
    docs.groupBy(norm.as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(id).as("canonical_id"))
  }

  /** Distinct (id, shingleSet) pairs used by both near-dup operators. */
  private def shingled(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"),
      TextOps.wordShingles(TextOps.words(col("text")), k).as("sh"))

  /** MinHash + LSH near-duplicate pairs, exact-verified.
    *
    * numHashes=128 minhashes from seeded xxhash64 (seed = hash index — the
    * Spark-side hash choice is free because verification recomputes exact
    * Jaccard); bands of 4 rows → collision probability 1-(1-j^4)^32, i.e.
    * ≥ 1 - 6e-8 for j ≥ 0.8: the banding misses essentially nothing above
    * the threshold, and the verify join discards everything below it.
    *
    * Plan shape: signatures are computed inside the scan (higher-order
    * functions, no explode); the explode is 32 band rows per doc; candidates
    * come from an equi-join on (band, bandHash); verification joins the
    * candidate ids back to their shingle sets. All three shuffles are keyed;
    * cost scales with docs + candidate pairs. */
  def minhashLshPairs(docs: DataFrame, threshold: Double,
                      shingleK: Int = 3, bands: Int = 32, rows: Int = 4): DataFrame = {
    val sh = shingled(docs, shingleK)
    val sig = sh.select(col("doc_id"), col("sh"),
      transform(sequence(lit(0), lit(bands * rows - 1)),
        i => array_min(transform(col("sh"), s => xxhash64(i, s)))).as("sig"))

    val banded = sig
      .select(col("doc_id"), explode(sequence(lit(0), lit(bands - 1))).as("b"), col("sig"))
      .select(col("doc_id"), col("b"),
        xxhash64(col("b") +: (1 to rows).map(r =>
          element_at(col("sig"), col("b") * rows + lit(r))): _*).as("bk"))

    val candidates = banded.as("x").join(banded.as("y"),
        col("x.b") === col("y.b") && col("x.bk") === col("y.bk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    verifyJaccard(candidates, sh, threshold)
  }

  /** Blocked pairwise n-gram Jaccard: candidates are pairs sharing the
    * blocking key (`lang`) and sitting in the same or adjacent word-count
    * bucket (each doc emits its bucket and bucket+1, so an equi-join covers
    * the ±1 neighborhood without a non-equi join). */
  def blockedNgramPairs(docs: DataFrame, threshold: Double,
                        shingleK: Int = 2, bucketWords: Int = 32): DataFrame = {
    val sh = shingled(docs, shingleK)
    val blk = floor(size(TextOps.words(col("text"))) / lit(bucketWords)).cast(IntegerType)
    val keyed = docs.select(col("doc_id"), col("lang"), blk.as("blk"))
      .select(col("doc_id"), col("lang"),
        explode(array(col("blk"), col("blk") + 1)).as("bkey"))

    val candidates = keyed.as("x").join(keyed.as("y"),
        col("x.lang") === col("y.lang") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    verifyJaccard(candidates, sh, threshold)
  }

  /** Exact Jaccard over distinct shingle sets for candidate pairs; keeps
    * pairs with jaccard ≥ threshold. |A∪B| = |A|+|B|-|A∩B| avoids
    * materializing the union. */
  private def verifyJaccard(candidates: DataFrame, sh: DataFrame,
                            threshold: Double): DataFrame = {
    val inter = size(array_intersect(col("sa.sh"), col("sb.sh")))
    val union = size(col("sa.sh")) + size(col("sb.sh")) - inter
    candidates
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (inter.cast(DoubleType) / union).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
