package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.Etl
import graft.schemas.Schemas
import graft.sinks.TableSink

/** The reference's semantic traps (SURVEY.md §7.5, FIXTURES.md), each pinned
  * by a unit spec on a tiny in-memory fixture. */
class EtlSemanticsSpec extends SparkSpec {

  private def ts(ms: Long) = new Timestamp(ms)

  private val eventsSchema = StructType(Seq(
    StructField("artist", StringType), StructField("song", StringType),
    StructField("length", DecimalType(12, 4)), StructField("page", StringType),
    StructField("ts", TimestampType), StructField("userId", IntegerType),
    StructField("level", StringType), StructField("sessionId", IntegerType),
    StructField("location", StringType), StructField("userAgent", StringType),
    StructField("firstName", StringType), StructField("lastName", StringType),
    StructField("gender", StringType)))

  private val songsSchema = StructType(Seq(
    StructField("artist_name", StringType), StructField("title", StringType),
    StructField("duration", DecimalType(12, 6)), StructField("song_id", StringType),
    StructField("artist_id", StringType), StructField("year", IntegerType),
    StructField("artist_location", StringType),
    StructField("artist_latitude", DecimalType(11, 3)),
    StructField("artist_longitude", DecimalType(11, 3))))

  private def bd(s: String, scale: Int) =
    new java.math.BigDecimal(s).setScale(scale)

  private def mkEvents(rows: Seq[Row]) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), eventsSchema)
  private def mkSongs(rows: Seq[Row]) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), songsSchema)

  private def ev(artist: String, song: String, len: String, page: String = "NextSong",
                 userId: Integer = 1): Row =
    Row(artist, song, if (len == null) null else bd(len, 4), page,
      ts(1541121934796L), userId, "free", 1, "City", "UA",
      "First", "Last", "M")

  private def so(artist: String, title: String, dur: String, id: String): Row =
    Row(artist, title, bd(dur, 6), id, s"AR$id", 2018, "loc",
      bd("1.5", 3), bd("-2.25", 3))

  test("J1: NULL join keys never match (null-unsafe =, not <=>)") {
    val events = mkEvents(Seq(ev(null, "t", "100.5"), ev("A", null, "100.5")))
    val songs  = mkSongs(Seq(so(null, "t", "100.5", "S1"), so("A", null, "100.5", "S2")))
    val out = Etl.songplay(events, songs).collect()
    out.length shouldBe 2                       // left outer keeps every event
    out.foreach(r => r.getAs[String]("song_id") shouldBe null)
  }

  test("J1: cross-scale decimal equality — (12,4) matches (12,6) after rescale") {
    val events = mkEvents(Seq(ev("A", "t", "100.5000"), ev("A", "t", "100.5001")))
    val songs  = mkSongs(Seq(so("A", "t", "100.500000", "S1")))
    val matched = Etl.songplay(events, songs).collect()
      .map(r => Option(r.getAs[String]("song_id")))
    matched.count(_.contains("S1")) shouldBe 1  // only the rescale-equal value
    matched.count(_.isEmpty) shouldBe 1
  }

  test("J1: duplicate (artist,title,duration) in songs fans out the fact") {
    val events = mkEvents(Seq(ev("A", "t", "100.5")))
    val songs  = mkSongs(Seq(so("A", "t", "100.5", "S1"), so("A", "t", "100.5", "S2")))
    Etl.songplay(events, songs).count() shouldBe 2
  }

  test("no page filter: non-NextSong events still become songplay rows") {
    val events = mkEvents(Seq(ev("A", "t", "1.0", page = "Home"),
                              ev("A", "t", "1.0", page = "NextSong")))
    Etl.songplay(events, mkSongs(Nil)).count() shouldBe 2
  }

  test("users: full-tuple DISTINCT over (id,first,last,gender) — changed name keeps both rows") {
    val rows = Seq(
      ev("A", "t", "1.0", userId = 7),
      ev("A", "t", "1.0", userId = 7).copy(), // identical tuple → deduped
      Row("A", "t", bd("1.0", 4), "NextSong", ts(1L), Integer.valueOf(7), "paid", 1,
        "City", "UA", "First", "Married", "M"), // same user, new lastName → second row
      Row("A", "t", bd("1.0", 4), "NextSong", ts(1L), Integer.valueOf(7), "paid", 1,
        "City", "UA", "First", "Last", "M"))  // level-only change → NOT a new row
    val out = Etl.users(mkEvents(rows)).collect()
    out.length shouldBe 2
    out.map(_.schema.fieldNames.toSeq).distinct.head shouldBe
      Seq("user_id", "first_name", "last_name", "gender") // no level column
  }

  test("users: F1 drops anonymous (null userId) events") {
    val events = mkEvents(Seq(ev("A", "t", "1.0", userId = null), ev("A", "t", "1.0")))
    Etl.users(events).count() shouldBe 1
  }

  test("time: insert-by-name reorder realigns scrambled column order (P3)") {
    val events = mkEvents(Seq(ev("A", "t", "1.0")))
    val t = Etl.time(events)
    t.schema.fieldNames.toSeq shouldBe Schemas.time.fieldNames.toSeq
    val r = t.head()
    // 1541121934796 ms = 2018-11-02T01:25:34.796Z (UTC session, ISO week 44)
    r.getAs[Int]("hour") shouldBe 1
    r.getAs[Int]("day") shouldBe 2
    r.getAs[Int]("week") shouldBe 44
    r.getAs[Int]("month") shouldBe 11
    r.getAs[Int]("year") shouldBe 2018
  }

  test("artists: X8 widening rescale (11,3) -> (11,8) + P3 reorder to DDL order") {
    val out = Etl.artists(mkSongs(Seq(so("A", "t", "1.0", "S1"))))
    // DDL column order: longitude BEFORE latitude (sql_queries.py:98-106)
    out.schema.fieldNames.toSeq shouldBe Schemas.artists.fieldNames.toSeq
    val a = out.head()
    a.getAs[java.math.BigDecimal]("artist_latitude") shouldBe bd("1.5", 8)
    a.getAs[java.math.BigDecimal]("artist_longitude") shouldBe bd("-2.25", 8)
  }

  test("insertByName reorders and casts to the target schema") {
    import spark.implicits._
    val df = Seq((1, "x")).toDF("b", "a")
    val target = StructType(Seq(StructField("a", StringType), StructField("b", LongType)))
    val out = TableSink.insertByName(df, target)
    out.schema.fieldNames.toSeq shouldBe Seq("a", "b")
    out.schema("b").dataType shouldBe LongType
    out.head() shouldBe Row("x", 1L)
  }

  test("S3A hook: the staging-source connector config maps exactly (network-free — the JdbcSink/Derby rule)") {
    // provider-chain default: only the filesystem binding, NO static keys
    // (an accidental empty-string credential would break the chain)
    GraftSession.s3aConf() shouldBe Map(
      "spark.hadoop.fs.s3a.impl" -> "org.apache.hadoop.fs.s3a.S3AFileSystem")
    // the dwh.cfg-style static case + an S3-compatible endpoint
    val full = GraftSession.s3aConf(
      accessKey = Some("AK"), secretKey = Some("SK"),
      endpoint = Some("s3.example.test"), pathStyleAccess = true)
    full("spark.hadoop.fs.s3a.access.key") shouldBe "AK"
    full("spark.hadoop.fs.s3a.secret.key") shouldBe "SK"
    full("spark.hadoop.fs.s3a.endpoint") shouldBe "s3.example.test"
    full("spark.hadoop.fs.s3a.path.style.access") shouldBe "true"
    full.keySet should have size 5
  }

  test("X9 analog: parameterized SQL is the engine-native form of the reference's string templating") {
    // The reference interpolates config values into SQL text
    // (sql_queries.py templates the IAM role / S3 paths via .format() —
    // SURVEY §2.8 X9, declared not-a-query-op). Spark's parameterized
    // spark.sql is the native equivalent: the same one-statement
    // flexibility with literals bound by the ENGINE, so a hostile config
    // value cannot splice syntax into the statement.
    val named = spark.sql(
      "SELECT :tbl AS t, :lim AS lim",
      Map("tbl" -> "songplay", "lim" -> 5))
    named.head() shouldBe Row("songplay", 5)
    // positional binding, and the would-be injection stays a LITERAL
    val pos = spark.sql("SELECT ? AS v", Array("'; DROP TABLE songplay --"))
    pos.head().getString(0) shouldBe "'; DROP TABLE songplay --"
  }

  test("q233 observe audit: metrics ride the production pass — one scan, recount-exact") {
    val sf = "/root/testdata/sf0.001"
    val out = PipelineQueries.q233ObserveAudit(spark, sf).collect()
    out should not be empty
    // every production row carries the SAME audit scalars
    out.map(r => (r.getAs[Long]("rows_scanned"), r.getAs[Long]("bad_qty_rows"),
      r.getAs[Long]("null_ship_rows"))).distinct should have size 1
    // the observed metrics equal an independent recount (the two-pass
    // price the observe pattern exists to avoid)
    val li = Tables.lineitem(spark, sf)
    out.head.getAs[Long]("rows_scanned") shouldBe li.count()
    out.head.getAs[Long]("bad_qty_rows") shouldBe
      li.filter(col("l_quantity") <= 0).count()
    out.head.getAs[Long]("null_ship_rows") shouldBe
      li.filter(col("l_shipdate").isNull).count()
    // production side is intact: per-group n_rows sums back to the scan count
    out.map(_.getAs[Long]("n_rows")).sum shouldBe
      out.head.getAs[Long]("rows_scanned")
  }
}
