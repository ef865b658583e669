package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** The driver's own sessions don't carry GraftExtensions; every operator
  * guards on functionExists and falls back to composable built-ins. This
  * spec drops the native functions from the registry, re-runs the
  * operators down their fallback paths, and asserts identical results —
  * then restores the registry. */
class FallbackSpec extends SparkSpec {
  import spark.implicits._

  private def withoutNativeFunctions[T](body: => T): T = {
    val reg = spark.sessionState.functionRegistry
    GraftExtensions.functions.foreach { case (ident, _, _) => reg.dropFunction(ident) }
    try body
    finally GraftExtensions.functions.foreach { case (ident, info, builder) =>
      reg.registerFunction(ident, info, builder)
    }
  }

  test("dedup fallbacks (agg-barrier minhash, array_intersect verify) match native") {
    val docs = Seq(
      (1L, (1 to 40).map(i => s"tok$i").mkString(" "), "en"),
      (2L, (1 to 40).map(i => if (i == 40) "x" else s"tok$i").mkString(" "), "en"),
      (3L, (100 to 140).map(i => s"o$i").mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
    val native = Dedup.minhashLshPairs(docs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    val fallback = withoutNativeFunctions {
      spark.catalog.functionExists("lsh_band_keys") shouldBe false
      Dedup.minhashLshPairs(docs, 0.8).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    }
    fallback shouldBe native
    native.length shouldBe 1
  }

  test("incremental-dedup and PQ-code fallbacks match the native paths") {
    val sf = "/root/testdata/sf0.001"
    // the q78 shape: fingerprints with a pass-through partition column,
    // probed by the q73 operator
    def runInc() = {
      val corpus = Tables.documents(spark, sf).filter(col("doc_id") >= 50)
      val sh = graft.operators.Dedup.shingleSets(corpus, 3, keep = Seq("lang"))
      val bands = graft.operators.Dedup.bandKeys(sh, 32, 4, keep = Seq("lang"))
      graft.operators.Dedup.incrementalNearDupPairs(bands, sh,
          Tables.documents(spark, sf).filter(col("doc_id") < 50), 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    }
    // the q76 shape: argmin code assignment through dist2For's l2_sq guard
    def runPq() = SimilarityQueries.q76PqCodes(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq.sorted
    val (nativeInc, nativePq) = (runInc(), runPq())
    val (fbInc, fbPq) = withoutNativeFunctions {
      spark.catalog.functionExists("l2_sq") shouldBe false
      (runInc(), runPq())
    }
    fbInc shouldBe nativeInc
    nativeInc should not be empty
    fbPq shouldBe nativePq
  }

  test("cdc_cuts fused byte scan matches the composable hash60 window chain (incl. non-BMP)") {
    val docs = Seq(
      (1L, (1 to 300).map(i => f"w${(i * 13) % 89}%02d").mkString(" ")),
      (2L, (1 to 40).map(i => s"sm\u00f6rg\u00e5sbord$i \ud83d\ude00 caf\u00e9${i * 7}")
        .mkString(" ")), // multibyte + non-BMP
      (3L, "abc"), // shorter than the window
      (4L, "")) // degenerate
      .toDF("doc_id", "text")
    def run() = DedupQueries.cdcChunks(docs, spark).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
      .toSeq.sorted
    val native = run()
    val fallback = withoutNativeFunctions {
      spark.catalog.functionExists("cdc_cuts") shouldBe false
      run()
    }
    fallback shouldBe native
    // the long docs really split (the property is non-vacuous)
    native.count(_._1 == 1L) should be > 1
    native.count(_._1 == 2L) should be > 1
  }

  test("char_class_counts fused scan matches the six-regex fallback (incl. non-ASCII)") {
    val sf = "/root/testdata/sf0.001"
    def run() = TextQueries.q75CharEntropy(spark, sf)
      .collect().map(r => r.toSeq.toList).toSeq.sortBy(_.head.asInstanceOf[Long])
    val native = run()
    val fallback = withoutNativeFunctions {
      spark.catalog.functionExists("char_class_counts") shouldBe false
      run()
    }
    fallback shouldBe native
    // the zh documents exercise the multi-byte `other` bucket
    native should not be empty
  }

  test("similarity fallback (HOF cosine fold) matches the native expression") {
    val vecs = (0 until 12).map(i =>
      (i.toLong, (0 until 16).map(j => ((i * 13 + j * 7) % 19 - 9) / 5.0f)))
      .toDF("vec_id", "embedding")
    def run() = Similarity
      .bruteForceTopK(vecs, vecs.filter(col("vec_id") < 2), k = 3,
        SimilarityQueries.cosineFnFor(spark))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq.sorted
    val native = run()
    val fallback = withoutNativeFunctions { run() }
    fallback shouldBe native
  }

  test("sign-bucket fallback (HOF dot fold) matches the native dot_fd path") {
    val vecs = (0 until 16).map(i =>
      (i.toLong, (0 until 16).map(j => ((i * 7 + j * 3) % 13 - 6) / 3.0f)))
      .toDF("vec_id", "embedding")
    val grid = Similarity.hyperplaneGrid(4, 16)
    val grids = (0 until 3).map(b => Similarity.mdGrid(s"fb$b", 4, 16))
    def runLsh() = Similarity.lshTopK(vecs, vecs.filter(col("vec_id") < 2), 3, grid,
        SimilarityQueries.cosineFnFor(spark))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq.sorted
    def runNd() = graft.operators.Dedup.cosineNearDupPairs(vecs, 0.3, grids,
        SimilarityQueries.cosineFnFor(spark))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    val (lshN, ndN) = (runLsh(), runNd())
    val (lshF, ndF) = withoutNativeFunctions {
      spark.catalog.functionExists("dot_fd") shouldBe false
      (runLsh(), runNd())
    }
    lshF shouldBe lshN
    ndF shouldBe ndN
  }

  test("ivf fallback (HOF l2 fold) matches the native l2_sq path") {
    val vecs = (0 until 12).map(i =>
      (i.toLong, (0 until 16).map(j => ((i * 11 + j * 5) % 17 - 8) / 4.0f)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.mdGrid("iv", 4, 16)
    def run() = Similarity
      .ivfTopK(vecs, vecs.filter(col("vec_id") < 2), k = 3, cents, nprobe = 2,
        SimilarityQueries.cosineFnFor(spark))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq.sorted
    val native = run()
    val fallback = withoutNativeFunctions {
      spark.catalog.functionExists("l2_sq") shouldBe false
      run()
    }
    fallback shouldBe native
    native should not be empty
  }

  test("cosine_sim agrees with the fallback on malformed input: ragged/null-element → NULL") {
    val rows = Seq(
      (1L, Seq(Some(1f), Some(2f)), Seq(Some(1f), Some(2f), Some(3f))), // ragged
      (2L, Seq(Some(1f), None),     Seq(Some(1f), Some(2f))),           // null element
      (3L, Seq(Some(1f), Some(0f)), Seq(Some(1f), Some(0f))))           // well-formed
      .toDF("id", "a", "b")
      .select(col("id"), col("a").cast("array<float>"), col("b").cast("array<float>"))
    val native = rows.select(col("id"), call_function("cosine_sim", col("a"), col("b")).as("sim"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq.sortBy(_._1)
    val fallback = rows.select(col("id"), Similarity.cosine(col("a"), col("b")).as("sim"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq.sortBy(_._1)
    native shouldBe fallback
    native.map(_._2.isDefined) shouldBe Seq(false, false, true)
  }

  test("sim_hash60 fused expression matches the explode+votes fallback") {
    val docs = Seq(
      (1L, "alpha beta beta gamma delta"),      // duplicate token votes twice
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, ""))                                  // trim+split -> [""] single token
      .toDF("doc_id", "text")
    def run() = TextQueries.simhashDf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val native = run()
    val fallback = withoutNativeFunctions {
      spark.catalog.functionExists("sim_hash60") shouldBe false
      run()
    }
    fallback shouldBe native
    native.length shouldBe 3
  }

  test("substr_count equals regexp_count on metachar-free literals (randomized)") {
    val rnd = new scala.util.Random(41)
    val pats = Seq("ab", "ión", " de", "aa", "the", "zzz")
    val rows = (1 to 60).map { i =>
      (i.toLong, (0 until 80).map(_ => "abión dethz "(rnd.nextInt(12))).mkString)
    }.toDF("id", "t")
    pats.foreach { p =>
      val got = rows.select(call_function("substr_count", col("t"), lit(p)).as("c"))
        .collect().map(_.getInt(0)).toSeq
      val want = rows.select(regexp_count(col("t"), lit(p)).as("c"))
        .collect().map(_.getInt(0)).toSeq
      got shouldBe want
    }
    // overlap semantics match regex: non-overlapping stepping; empty
    // pattern matches regexp_count's empty-regex position count (true
    // drop-in, no silently-different edge)
    Seq(("aaaa", "aa", 2), ("aaa", "aa", 1), ("", "aa", 0),
        ("abc", "", 4), ("", "", 1)).toDF("t", "p", "want")
      .select(call_function("substr_count", col("t"), col("p")).as("c"), col("want"))
      .collect().foreach(r => r.getInt(0) shouldBe r.getInt(1))
    // supplementary (surrogate-pair) text: the empty-pattern parity claims
    // numChars+1 CODE POINTS, while Java's zero-width-match advance over
    // surrogates is a JDK implementation detail — pin the two against each
    // other DYNAMICALLY (on this JDK) so a runtime where they diverge fails
    // loudly instead of shipping a silently-different edge. Non-empty
    // supplementary patterns ride the same pin.
    Seq(("abc", ""), ("", ""), ("a🦜b", ""), ("🦜🦜", ""),
        ("a🦜b🦜", "🦜"), ("🦜", "a")).toDF("t", "p")
      .select(regexp_count(col("t"), col("p")).as("c"),
        call_function("substr_count", col("t"), col("p")).as("s"))
      .collect().foreach(r => r.getInt(1) shouldBe r.getInt(0))
  }

  test("sim_hash60 yields NULL (not NPE) for a null array element") {
    // The expression is SQL-registered and callable on arbitrary
    // array<string>; a null element must propagate NULL like the fallback.
    val r = spark.sql(
      "SELECT sim_hash60(array('a', CAST(NULL AS STRING), 'b')), sim_hash60(array('a','b'))")
      .collect()(0)
    r.isNullAt(0) shouldBe true
    r.isNullAt(1) shouldBe false
  }

  test("fingerprint fallback (HOF md5 chain) matches the fused expression") {
    val docs = Seq((1L, (1 to 20).map(i => s"w$i").mkString(" "), "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.createOrReplaceTempView("fpdocs")
    def run() = TextQueries.q18Fingerprint(spark, "/root/testdata/sf0.001")
      .orderBy("doc_id").limit(5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val native = run()
    val fallback = withoutNativeFunctions { run() }
    fallback shouldBe native
  }

  test("hilbert2 native codegen loop, built-ins fold, and JVM reference are bit-identical") {
    import graft.operators.Scale
    val n = 32 // exhaustive 32×32 grid at bits=5, plus full-width points
    val grid = (0 until n).flatMap(x => (0 until n).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    def run(df: org.apache.spark.sql.DataFrame, bits: Int) = df
      .withColumn("h", Scale.hilbert2For(spark)(col("x"), col("y"), bits))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    spark.catalog.functionExists("hilbert2") shouldBe true
    val native = run(grid, 5)
    val fold = withoutNativeFunctions {
      spark.catalog.functionExists("hilbert2") shouldBe false
      run(grid, 5)
    }
    fold shouldBe native
    native.foreach { case (x, y, h) =>
      h shouldBe Scale.hilbert2Jvm(x, y, 5)
    }
    val wide = Seq((65535L, 1L), (31337L, 4242L), (0L, 65535L)).toDF("x", "y")
    run(wide, 16).foreach { case (x, y, h) =>
      h shouldBe Scale.hilbert2Jvm(x, y, 16)
    }
  }

  test("q82 without the bloom functions drops the prefilter, keeps the exact answer") {
    def run() = DedupQueries.q82BloomDecontam(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val native = run()
    val fallback = withoutNativeFunctions {
      spark.catalog.functionExists("bloom_might_contain") shouldBe false
      run()
    }
    fallback shouldBe native
    // and the prefiltered plan really is the prefiltered plan
    val p = DedupQueries.q82BloomDecontam(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    p should include("might_contain")
  }
}
