package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.JsonSource

/** Declared-schema JSON scans (S1/S2): jsonpaths mapping, auto name-match,
  * missing-key → NULL, string→int cast of malformed values. */
class JsonSourceSpec extends SparkSpec {

  private def writeJson(lines: String*): String = {
    val dir = Files.createTempDirectory("graft-json")
    Files.write(dir.resolve("part-0.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  private val raw = StructType(Seq(
    StructField("ts", LongType),
    StructField("userId", StringType),
    StructField("page", StringType)))

  test("jsonpaths mode renames/casts per the field->column map") {
    val dir = writeJson(
      """{"ts": 1541121934796, "userId": "101", "page": "NextSong"}""",
      """{"ts": 1541121934797, "userId": "", "page": "Home"}""")
    val df = JsonSource.jsonpaths(spark, dir, raw, Seq(
      "start_time" -> Epoch.millisToTimestamp(col("ts")),
      "user_id"    -> JsonSource.intOrNull(col("userId")),
      "page"       -> col("page")))
    df.schema.fieldNames.toSeq shouldBe Seq("start_time", "user_id", "page")
    val rows = df.orderBy("start_time").collect()
    rows(0).getAs[java.sql.Timestamp]("start_time").getTime shouldBe 1541121934796L
    rows(0).getAs[Integer]("user_id") shouldBe 101
    rows(1).getAs[Integer]("user_id") shouldBe null // "" → NULL int, like Redshift COPY
  }

  test("auto mode name-matches and leaves absent keys NULL") {
    val dir = writeJson(
      """{"userId": "7"}""",
      """{"page": "Home", "extra_ignored": 5}""")
    val df = JsonSource.auto(spark, dir, raw)
    df.count() shouldBe 2
    df.filter(col("ts").isNull).count() shouldBe 2
    df.filter(col("page").isNull).count() shouldBe 1
    df.schema.fieldNames.toSeq shouldBe Seq("ts", "userId", "page") // extra key pruned
  }

  test("autoTolerant splits clean rows from captured corrupt lines") {
    val dir = writeJson(
      """{"ts": 1, "userId": "7", "page": "Home"}""",
      """{"ts": 2, "userId": oops-not-json""",
      """{"ts": 3, "page": "NextSong"}""")
    val df = JsonSource.autoTolerant(spark, dir, raw).cache()
    try {
      df.count() shouldBe 3
      val clean = df.filter(col("_corrupt_record").isNull)
      val rejects = df.filter(col("_corrupt_record").isNotNull)
      clean.count() shouldBe 2
      rejects.count() shouldBe 1
      // the reject preserves the raw line for the audit trail
      rejects.collect()(0).getAs[String]("_corrupt_record") should include("oops-not-json")
      // plain auto() (default PERMISSIVE) null-fills the bad line SILENTLY
      // — same row count, no captured text: the gap autoTolerant closes
      JsonSource.auto(spark, dir, raw).count() shouldBe 3
      // FAILFAST is the abort posture (reference COPY maxerror 0)
      an[Exception] should be thrownBy {
        spark.read.schema(raw).option("mode", "FAILFAST").json(dir).collect()
      }
      // declaring the corrupt column yourself must not duplicate it
      JsonSource.autoTolerant(spark, dir,
        raw.add("_corrupt_record", org.apache.spark.sql.types.StringType))
        .schema.fieldNames.count(_ == "_corrupt_record") shouldBe 1
    } finally df.unpersist()
  }

  test("sources are scheme-agnostic: an explicit file:// URI reads identically") {
    // The reference's S1/S2 read s3://udacity-dend/... (sql_queries.py:121-128,
    // bucket from dwh.cfg); this engine addresses sources through the Hadoop
    // FileSystem API, so the SAME code serves s3a:// by swapping scheme +
    // credentials config (spark.hadoop.fs.s3a.*) — no engine logic changes.
    // Pin that contract: a fully-qualified URI from the Hadoop FS layer and
    // the bare local path produce identical staging frames.
    val dir = writeJson(
      """{"ts": 1541121934796, "userId": "101", "page": "NextSong"}""",
      """{"ts": 1541121934797, "userId": "", "page": "Home"}""")
    val hadoopPath = new org.apache.hadoop.fs.Path(dir)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qualified = fs.makeQualified(hadoopPath) // file:/... with explicit scheme
    qualified.toUri.getScheme shouldBe "file"

    val viaUri = JsonSource.auto(spark, qualified.toString, raw)
    val viaPath = JsonSource.auto(spark, dir, raw)
    viaUri.schema shouldBe viaPath.schema
    viaUri.exceptAll(viaPath).count() shouldBe 0L
    viaPath.exceptAll(viaUri).count() shouldBe 0L
    viaUri.count() shouldBe 2L
  }

  test("q232 VARIANT scan ≡ the declared-schema scan on every shared field") {
    // The open-schema path (parse once into VARIANT, extract by path) must
    // agree bit-for-bit with the declared-schema reader over the SAME
    // fixture lines — including writer-omitted null fields reading back as
    // NULL from both. Proves the two ingest modes can never drift.
    val sf = "/root/testdata/sf0.001"
    val v = IngestQueries.q232VariantScan(spark, sf)
    val declared = JsonSource.auto(spark,
        graft.sources.Fixtures.ensureEventsJson(spark, sf),
        graft.sources.Fixtures.eventsRawSchema)
      .select(col("eventId").as("event_id"),
        col("eventKind").as("event_type"), col("valueNum").as("value"),
        col("artistName").as("artist"),
        col("sessionId").cast(IntegerType).as("session_id"),
        get_json_object(col("propsJson"), "$.k").cast(IntegerType).as("k"))
    v.count() shouldBe declared.count()
    v.exceptAll(declared).count() shouldBe 0L
    declared.exceptAll(v).count() shouldBe 0L
    // the missing-field semantic is actually exercised: some lines omit
    // artistName entirely and must surface as NULL, not parse failures
    v.filter(col("artist").isNull).count() should be > 0L
  }

  test("VARIANT ingest tolerance: try_parse_json quarantines garbage as NULL; parse_json is strict") {
    // q232 uses the STRICT parse (its fixture is machine-written); a feed
    // with untrusted producers swaps in try_parse_json — same plan, bad
    // lines become NULL variants and filter out exactly like
    // autoTolerant's corrupt-record split
    val dir = writeJson("""{"a": 1}""", """not json at all""")
    val tolerant = spark.read.text(dir)
      .select(col("value"), try_parse_json(col("value")).as("v"))
    tolerant.filter(col("v").isNull).count() shouldBe 1L
    tolerant.filter(col("v").isNotNull).count() shouldBe 1L
    // and the quarantined RAW line is still addressable for the reject sink
    tolerant.filter(col("v").isNull).select(col("value")).head().getString(0) shouldBe
      "not json at all"
    intercept[org.apache.spark.SparkException] {
      spark.read.text(dir).select(parse_json(col("value"))).collect()
    }
  }
}
