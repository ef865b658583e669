package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Similarity}

/** Similarity + multimodal operator semantics on controlled fixtures. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("cosine: exact values for known vectors") {
    val d = vecs(
      (0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)), (2L, Seq(1f, 1f)), (3L, Seq(-1f, 0f)))
    val out = Similarity.bruteForceTopK(d, d.filter(col("vec_id") === 0), k = 3)
      .orderBy("rank").collect()
    out.map(_.getAs[Long]("neighbor_id")).toSeq shouldBe Seq(2L, 1L, 3L)
    out(0).getAs[Double]("sim") shouldBe (1.0 / math.sqrt(2.0))
    out(1).getAs[Double]("sim") shouldBe 0.0
    out(2).getAs[Double]("sim") shouldBe -1.0
  }

  test("bruteForceTopK: ties broken by neighbor_id, k bounds output") {
    val d = vecs((0L, Seq(1f, 0f)), (5L, Seq(2f, 0f)), (4L, Seq(3f, 0f)), (9L, Seq(4f, 0f)))
    val out = Similarity.bruteForceTopK(d, d.filter(col("vec_id") === 0), k = 2)
      .orderBy("rank").collect()
    // all sims are exactly 1.0 → rank by id: 4 before 5; 9 cut by k=2
    out.map(_.getAs[Long]("neighbor_id")).toSeq shouldBe Seq(4L, 5L)
  }

  test("hyperplane grid is deterministic and in [-1000, 1000]") {
    val g1 = Similarity.hyperplaneGrid(8, 64)
    val g2 = Similarity.hyperplaneGrid(8, 64)
    g1.map(_.toSeq).toSeq shouldBe g2.map(_.toSeq).toSeq
    all(g1.flatten.toSeq) should (be >= -1000 and be <= 1000)
  }

  test("lshTopK only returns same-bucket neighbors, ranked by cosine") {
    val grid = Similarity.hyperplaneGrid(4, 2)
    val d = vecs((0L, Seq(1f, 0.1f)), (1L, Seq(1f, 0.2f)), (2L, Seq(-1f, -0.1f)))
    val out = Similarity.lshTopK(d, d.filter(col("vec_id") === 0), k = 2, grid)
      .collect()
    // vector 2 points the opposite way → different sign bucket → absent
    out.map(_.getAs[Long]("neighbor_id")).toSet shouldBe Set(1L)
  }

  test("native cosine_sim expression is bit-identical to the HOF fold") {
    spark.catalog.functionExists("cosine_sim") shouldBe true // GraftExtensions installed
    val d = vecs((0 until 30).map(i =>
      (i.toLong, (0 until 64).map(j => ((i * 31 + j * 17) % 97 - 48) / 7.0f))): _*)
    val both = d.as("a").join(d.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("hof"),
        call_function("cosine_sim", col("a.embedding"), col("b.embedding")).as("native"))
      .collect()
    both.length shouldBe 435
    both.foreach { r =>
      // exact bit equality, not approx — same IEEE ops in the same order
      java.lang.Double.doubleToLongBits(r.getDouble(0)) shouldBe
        java.lang.Double.doubleToLongBits(r.getDouble(1))
    }
  }

  test("ivfTopK assigns to nearest cell and only ranks in-cell candidates") {
    // 2-dim toy centroids: cell 0 at (1,0), cell 1 at (-1,0)
    val cents = Array(Array(1000, 0), Array(-1000, 0))
    val d = vecs(
      (0L, Seq(0.9f, 0.1f)), (1L, Seq(0.8f, -0.1f)),  // near cell 0
      (2L, Seq(-0.9f, 0.05f)))                        // near cell 1
    val out = Similarity.ivfTopK(d, d.filter(col("vec_id") === 0), k = 2, cents, nprobe = 1)
      .collect()
    // with nprobe=1 only cell 0 is probed: vector 2 (cell 1) is invisible
    out.map(_.getAs[Long]("neighbor_id")).toSet shouldBe Set(1L)
    val both = Similarity.ivfTopK(d, d.filter(col("vec_id") === 0), k = 2, cents, nprobe = 2)
      .collect()
    both.map(_.getAs[Long]("neighbor_id")).toSet shouldBe Set(1L, 2L)
  }

  test("native min_hash60 equals the md5 HOF chain exactly") {
    import graft.operators.TextOps
    val docs = Seq("alpha beta gamma delta", "one two", "x").toDF("text")
    val sh = TextOps.wordShingles(TextOps.words(col("text")), 2)
    val rows = docs.select(
        call_function("min_hash60", sh).as("native"),
        array_min(transform(sh, x => TextOps.hash60(x))).as("hof"))
      .collect()
    rows.foreach(r => r.getLong(0) shouldBe r.getLong(1))
  }

  test("fused min_md5_shingle60 equals min_hash60 over built shingles") {
    import graft.operators.TextOps
    val docs = Seq("alpha beta gamma delta epsilon", "one two", "x").toDF("text")
    val w = TextOps.words(col("text"))
    val sh = TextOps.wordShingles(w, 3)
    val rows = docs.select(
        call_function("min_md5_shingle60", w, lit(3)).as("fused"),
        call_function("min_hash60", sh).as("built"))
      .collect()
    rows.foreach(r => r.getLong(0) shouldBe r.getLong(1))
  }

  test("multimodal decode stub: deterministic features, OOB frames hash empty") {
    val docs = Seq((7L, "abcdefgh-rest-of-payload", "en", "x", 24L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.mediaTable(docs)
    media.schema("meta").dataType.typeName shouldBe "struct"
    val typed = media.select(col("doc_id"), col("payload"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.channels").as("channels"), col("meta.format").as("format"))
      .as[Multimodal.MediaRow]
    val f = Multimodal.decodeFeatures(typed).head()
    f.byte_len shouldBe 24L
    f.codec_byte shouldBe 'a'.toInt
    f.header_hex shouldBe "6162636465666768"
    // frame1 starts at byte 101 > len → empty-slice digest
    f.frame1_md5 shouldBe "d41d8cd98f00b204e9800998ecf8427e"
    f.frame0_md5 should not be f.frame1_md5
  }

  test("sampleFrames: stride offsets, maxFrames cap, partial tail frame; resize floors at 1") {
    // 250 bytes at stride 101 → offsets 0, 101, 202 (3 frames, tail is 48 bytes)
    val text = ("ab" * 125)
    val docs = Seq((3L, text, "en", "x", 250L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.mediaTable(docs)
    val frames = Multimodal.sampleFrames(media).orderBy("frame_idx").collect()
    frames.map(_.getAs[Int]("frame_idx")).toSeq shouldBe Seq(0, 1, 2)
    frames.map(_.getAs[Int]("frame_off")).toSeq shouldBe Seq(0, 101, 202)
    // cap: a 10_000-byte doc yields exactly maxFrames rows
    val big = Seq((4L, "x" * 10000, "en", "x", 10000L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    Multimodal.sampleFrames(Multimodal.mediaTable(big), maxFrames = 8).count() shouldBe 8L
    // an empty payload has NO frames (not phantom descending-sequence rows)
    val empty = Seq((5L, "", "en", "x", 0L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    Multimodal.sampleFrames(Multimodal.mediaTable(empty)).count() shouldBe 0L
    // resize stub: integer-halve, floor at 1
    import org.apache.spark.sql.functions.lit
    val (w2, h2) = Multimodal.resizeMeta(lit(639), lit(0), 2)
    val r = docs.select(w2.as("w"), h2.as("h")).head()
    r.getAs[Int]("w") shouldBe 319
    r.getAs[Int]("h") shouldBe 1
  }
}
