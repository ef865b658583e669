package graft

import org.apache.spark.sql.functions._

import graft.operators.{Scale, TextOps}

/** Text-analysis + sampling operator semantics on controlled fixtures. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hash60 is non-negative, stable, and matches the documented md5 derivation") {
    val got = Seq("abc").toDF("s")
      .select(TextOps.hash60(col("s")).as("h")).as[Long].head()
    // first 15 hex chars of md5('abc') = '900150983cd24fb'
    got shouldBe java.lang.Long.parseLong("900150983cd24fb", 16)
    got should be >= 0L
  }

  test("vocabHits counts occurrences, not distinct matches") {
    val hits = Seq("the cat the dog a cat").toDF("text")
      .select(TextOps.vocabHits(TextOps.words(col("text")), Seq("the", "a")).as("n"))
      .as[Int].head()
    hits shouldBe 3 // the, the, a
  }

  test("lang-id picks the max-evidence language with deterministic tie-break") {
    val df = Seq(
      (1L, "the cat and the dog", "en", "s", 19L),
      (2L, "der hund und die katze ist", "de", "s", 26L),
      (3L, "xyzzy plugh", "zh", "s", 11L)) // no stopword evidence → 'und'
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    df.createOrReplaceTempView("unused")
    val out = TextQueries.q16LangId.apply(spark, "/root/testdata/sf0.001") // smoke: runs
    out.columns should contain allOf ("predicted", "score", "is_match")
    // direct semantic check on the fixture
    val direct = {
      import org.apache.spark.sql.DataFrame
      val q: DataFrame = df
      val w = TextOps.words(col("text"))
      val scores = Seq(
        "de" -> TextOps.vocabHits(w, Seq("der", "die", "das", "und", "ist")),
        "en" -> TextOps.vocabHits(w, Seq("the", "a", "and", "of", "in")))
      val best = greatest(scores.map(_._2): _*)
      val predicted = scores.foldLeft(when(best === 0, lit("und"))) {
        case (acc, (code, sc)) => acc.when(sc === best, lit(code))
      }
      q.select(col("doc_id"), predicted.as("p")).orderBy("doc_id")
        .as[(Long, String)].collect().toSeq
    }
    direct shouldBe Seq((1L, "en"), (2L, "de"), (3L, "und"))
  }

  test("stratified sample keeps a doc iff its hash bucket is under the lang rate") {
    val out = SampleQueries.q31StratifiedSample(spark, "/root/testdata/sf0.001")
      .collect()
    out.length should be > 0
    // weights reflect the keep rate exactly
    out.foreach { r =>
      val (lang, w) = (r.getAs[String]("lang"), r.getAs[Double]("weight"))
      lang match {
        case "en" => w shouldBe 2.5   // 100/40
        case "zh" => w shouldBe 1.25  // 100/80
        case _    => w shouldBe 1.0
      }
    }
    // determinism: second run identical
    SampleQueries.q31StratifiedSample(spark, "/root/testdata/sf0.001")
      .collect().map(_.getLong(0)).toSeq shouldBe out.map(_.getLong(0)).toSeq
  }

  test("saltedAgg equals the direct aggregation exactly") {
    val df = (1 to 1000).map(i => (s"k${i % 3}", i.toLong)).toDF("k", "v")
    val salted = Scale.saltedAgg(df, col("k"), col("v"), salts = 8)(
        "cnt" -> count(lit(1)), "total" -> sum(col("v")))
      .orderBy("k").collect()
    val direct = df.groupBy(col("k"))
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("total"))
      .orderBy("k").collect()
    salted.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq shouldBe
      direct.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("q42 chunking: no chunk is contained in its predecessor; coverage is exact") {
    def chunks(nWords: Int) = {
      val doc = Seq((1L, (1 to nWords).map(i => s"w$i").mkString(" "), "en", "x", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      // the same start-generation expressions q42 builds, on a tiny doc
      val w = graft.operators.TextOps.words(col("text"))
      import org.apache.spark.sql.functions.{explode, sequence, greatest, lit, slice, size => asize}
      doc.select(col("doc_id"), w.as("w"))
        .select(col("doc_id"),
          explode(sequence(lit(0), greatest(asize(col("w")) - 1 - lit(16), lit(0)), lit(48)))
            .as("s"), asize(col("w")).as("nw"))
        .collect().map(r => (r.getAs[Int]("s"), r.getAs[Int]("nw"))).toSeq.sortBy(_._1)
    }
    // shorter than window+overlap: exactly one chunk
    chunks(49).map(_._1) shouldBe Seq(0)
    chunks(64).map(_._1) shouldBe Seq(0)
    // 100 words: starts {0, 48}; the dropped start 96 would add nothing
    // (words 97..100 are inside chunk(48) = words 49..112) and chunk(48)
    // spans through word 112 >= 100 -> coverage exact
    chunks(100).map(_._1) shouldBe Seq(0, 48)
    // just past the containment bound: start 48 adds word 65
    chunks(65).map(_._1) shouldBe Seq(0, 48)
  }

  test("Pii counts and redacts emails, phones, IPs; order prevents cross-matching") {
    import graft.operators.Pii
    val rows = Seq(
      (1L, "mail a.b+c@sub.example.org and x@y.io here"),
      (2L, "call 415-555-0134 or 415.555.9999"),
      (3L, "host 10.0.200.7 peer 192.168.1.1"),
      (4L, "clean text with no identifiers at all"),
      (5L, "mixed bob@corp.net from 172.16.0.9 dial 212-555-0001"))
      .toDF("doc_id", "text")
    val out = rows.select(col("doc_id"),
        Pii.emailCount(col("text")).as("e"), Pii.phoneCount(col("text")).as("p"),
        Pii.ipCount(col("text")).as("i"), Pii.redact(col("text")).as("r"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4))).sortBy(_._1)
    out.map(t => (t._2, t._3, t._4)) shouldBe
      Seq((2, 0, 0), (0, 2, 0), (0, 0, 2), (0, 0, 0), (1, 1, 1))
    out(0)._5 shouldBe "mail [EMAIL] and [EMAIL] here"
    out(1)._5 shouldBe "call [PHONE] or [PHONE]"
    out(2)._5 shouldBe "host [IP] peer [IP]"
    out(4)._5 shouldBe "mixed [EMAIL] from [IP] dial [PHONE]"
  }

  test("zOrder2 interleaves bits: a at even positions, b at odd") {
    // a=5 (101), b=3 (011) -> z bits b2 a2 b1 a1 b0 a0 = 011011 = 27
    val r = Seq((5L, 3L), (0L, 0L), (65535L, 0L), (0L, 65535L))
      .toDF("a", "b")
      .select(Scale.zOrder2(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    r(0) shouldBe 27L
    r(1) shouldBe 0L
    // 16 one-bits at even positions = 0x55555555; odd = 0xAAAAAAAA
    r(2) shouldBe 0x55555555L
    r(3) shouldBe 0xAAAAAAAAL
  }

  test("mixtureRebalance: unknown lang gets rate 0 without an ANSI divide-by-zero") {
    // 'xx' is outside the target mix -> target 0; the guard must exclude it
    // from the bottleneck min and emit rate 0 / kept=false, not throw.
    val docs = ((1 to 10).map(i => (i.toLong, "en")) ++ Seq((11L, "xx")) ++
      Seq("de", "es", "fr", "zh").zipWithIndex.map { case (l, i) => (12L + i, l) })
      .toDF("doc_id", "lang")
    val out = SampleQueries.mixtureRebalance(docs).collect()
    val xx = out.find(_.getAs[String]("lang") == "xx").get
    xx.getAs[Double]("rate") shouldBe 0.0
    xx.getAs[Boolean]("kept") shouldBe false
    out.count(_.getAs[String]("lang") == "en") shouldBe 10
  }

  test("Urls extracts hosts sorted-distinct and flags blocklisted domains") {
    import graft.operators.Urls
    import org.apache.spark.sql.functions.{size => asize}
    val rows = Seq(
      (1L, "go https://b.example.com/x and http://a.example.org then https://b.example.com/y"),
      (2L, "bad http://spam.biz/buy?q=1 mixed https://ok.io/p"),
      (3L, "no links at all"))
      .toDF("doc_id", "text")
    val out = rows.select(col("doc_id"),
        asize(Urls.urls(col("text"))).as("n"),
        concat_ws(",", Urls.domains(col("text"))).as("d"),
        Urls.hasBlocked(Urls.domains(col("text")), Seq("spam.biz")).as("b"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getBoolean(3)))
      .sortBy(_._1)
    out(0) shouldBe (1L, 3, "a.example.org,b.example.com", false)
    out(1) shouldBe (2L, 2, "ok.io,spam.biz", true)
    out(2) shouldBe (3L, 0, "", false)
  }
}
