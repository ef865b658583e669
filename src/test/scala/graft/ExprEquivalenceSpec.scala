package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.operators.{Similarity, TextOps}

/** Randomized (seeded) equivalence: every native expression must be
  * BIT-IDENTICAL to its composable fallback over arbitrary inputs, not just
  * the fixtures the other specs pin. Double outputs are compared as raw
  * IEEE bits (doubleToRawLongBits via cast trickery would lose NaN; we
  * compare on the JVM side), so "almost equal" can never pass. */
class ExprEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20260812L)

  private def randFloats(n: Int): Seq[Float] =
    Seq.fill(n)((rnd.nextFloat() - 0.5f) * rnd.nextInt(200).toFloat)

  test("cosine_sim / l2_sq / dot_fd are bit-identical to their folds on random vectors") {
    // No zero vectors: under ANSI mode the HOF fallback raises DIVIDE_BY_ZERO
    // there while the native loop yields NaN — embeddings are non-zero by
    // contract (noted in CosineSimilarity's scaladoc), so the comparable
    // domain is non-zero vectors.
    val rows = (0 until 120).map { i =>
      val n = 1 + rnd.nextInt(64)
      val a = randFloats(n)
      val b = randFloats(n)
      (i.toLong, a, b, b.map(_.toDouble))
    }
    val df = rows.toDF("id", "a", "b", "bd")
    val cmp = df.select(
      call_function("cosine_sim", col("a"), col("b")).as("cos_n"),
      Similarity.cosine(col("a"), col("b")).as("cos_f"),
      call_function("l2_sq", col("a"), col("bd")).as("l2_n"),
      aggregate(zip_with(col("a"), col("bd"),
          (x, y) => (x.cast(DoubleType) - y) * (x.cast(DoubleType) - y)),
        lit(0.0), (acc, d) => acc + d).as("l2_f"),
      call_function("dot_fd", col("a"), col("bd")).as("dot_n"),
      aggregate(zip_with(col("a"), col("bd"),
          (x, y) => x.cast(DoubleType) * y),
        lit(0.0), (acc, v) => acc + v).as("dot_f"))
      .collect()
    cmp.foreach { r =>
      for ((n, f) <- Seq((0, 1), (2, 3), (4, 5))) {
        java.lang.Double.doubleToLongBits(r.getDouble(n)) shouldBe
          java.lang.Double.doubleToLongBits(r.getDouble(f))
      }
    }
  }

  test("jaccard_sim equals the array_intersect formulation on random hash sets") {
    val rows = (0 until 100).map { i =>
      def set() = Seq.fill(1 + rnd.nextInt(60))(rnd.nextLong().abs % 50).distinct.sorted
      (i.toLong, set(), set())
    }
    val df = rows.toDF("id", "a", "b")
    val sz = org.apache.spark.sql.functions.size _
    val inter = sz(array_intersect(col("a"), col("b")))
    val cmp = df.select(
      call_function("jaccard_sim", col("a"), col("b")).as("n"),
      (inter.cast(DoubleType) / (sz(col("a")) + sz(col("b")) - inter)).as("f"))
      .collect()
    cmp.foreach { r =>
      java.lang.Double.doubleToLongBits(r.getDouble(0)) shouldBe
        java.lang.Double.doubleToLongBits(r.getDouble(1))
    }
  }

  test("hashed_shingles preserves set relations of the string shingles on random pairs") {
    // The native hash is deliberately different from xxhash64 (set identity
    // is the contract, not value identity): for random document pairs the
    // (|A|, |B|, |A∩B|) triple — everything Jaccard depends on — must agree
    // between the native hashed sets and the string shingle sets.
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    def doc() = Seq.fill(3 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.length)))
    val rows = (0 until 80).map(i => (i.toLong, doc(), doc()))
    val df = rows.toDF("id", "wa", "wb")
    val sz = org.apache.spark.sql.functions.size _
    val cmp = df.select(
      sz(call_function("hashed_shingles", col("wa"), lit(2))).as("na"),
      sz(call_function("hashed_shingles", col("wb"), lit(2))).as("nb"),
      sz(array_intersect(
        call_function("hashed_shingles", col("wa"), lit(2)),
        call_function("hashed_shingles", col("wb"), lit(2)))).as("ni"),
      sz(TextOps.wordShingles(col("wa"), 2)).as("sa"),
      sz(TextOps.wordShingles(col("wb"), 2)).as("sb"),
      sz(array_intersect(
        TextOps.wordShingles(col("wa"), 2),
        TextOps.wordShingles(col("wb"), 2))).as("si"))
      .collect()
    cmp.foreach { r =>
      (r.getInt(0), r.getInt(1), r.getInt(2)) shouldBe (r.getInt(3), r.getInt(4), r.getInt(5))
    }
  }

  test("min_hash60 equals the md5 HOF chain on random token arrays") {
    val rows = (0 until 100).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(40))(
        rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString))
    }
    val df = rows.toDF("id", "w")
    val cmp = df.select(
      call_function("min_hash60", col("w")).as("n"),
      array_min(transform(col("w"), s => TextOps.hash60(s))).as("f"))
      .collect()
    cmp.foreach(r => r.getLong(0) shouldBe r.getLong(1))
  }
}
