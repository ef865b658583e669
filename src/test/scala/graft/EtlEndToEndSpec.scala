package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Etl
import graft.sinks.ParquetSink

/** Full pipeline run at smoke scale: materialized star tables satisfy the
  * reference's derived invariants (BASELINE.md): |time| = |distinct ts|,
  * |songplay| ≥ |events| (left outer + fanout), users excludes anonymous,
  * and the sortkey presort leaves each parquet file internally ordered. */
class EtlEndToEndSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("star build materializes all five tables with reference invariants") {
    val counts = Etl.run(spark, sf)
    val sink = new ParquetSink(Etl.starRoot(sf))

    val events = Etl.stageEvents(spark, sf)
    val nEvents = events.count()

    counts("songplay") should be >= nEvents // left outer keeps all + fanout
    counts("time") shouldBe events.select(col("ts")).distinct().count()
    counts("users") shouldBe events.filter(col("userId").isNotNull)
      .select("userId", "firstName", "lastName", "gender").distinct().count()
    Etl.tables.foreach(t => counts(t) should be > 0L)

    // schema contract: every materialized table matches its DDL StructType
    // exactly — names, order, AND types (users has no level; songs uses
    // song_title; session_id is a varchar; artists is longitude-first)
    import graft.schemas.Schemas
    val contracts = Map(
      "songplay" -> Schemas.songplay, "users" -> Schemas.users,
      "songs" -> Schemas.songs, "artists" -> Schemas.artists,
      "time" -> Schemas.time)
    contracts.foreach { case (t, expected) =>
      val got = sink.read(spark, t).schema
      got.fieldNames.toSeq shouldBe expected.fieldNames.toSeq
      got.fields.map(_.dataType).toSeq shouldBe expected.fields.map(_.dataType).toSeq
    }
  }

  test("sortkey presort: each songplay file is internally ordered by start_time") {
    Etl.run(spark, sf)
    val sink = new ParquetSink(Etl.starRoot(sf))
    import org.apache.spark.sql.Row
    val unordered = sink.read(spark, "songplay")
      .select(input_file_name().as("f"), col("start_time"))
      .withColumn("prev", lag(col("start_time"), 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("f"))
          .orderBy(monotonically_increasing_id())))
      .filter(col("prev") > col("start_time"))
    unordered.count() shouldBe 0L
  }

  test("E3: the notebook's literal validation SQL runs through spark.sql over songsdwh") {
    val counts = Etl.run(spark, sf)
    Etl.registerWarehouse(spark, sf)
    val sink = new ParquetSink(Etl.starRoot(sf))
    Etl.tables.foreach { t =>
      // test_etl.ipynb cells 8–21, verbatim (including the `limit(5)` form):
      // the SQL surface must agree with the DataFrame results on the same
      // materialized tables.
      spark.sql(s"select count(*) from songsdwh.$t")
        .head.getLong(0) shouldBe counts(t)
      val five = spark.sql(s"select * from songsdwh.$t limit(5)")
      five.schema shouldBe sink.read(spark, t).schema
      five.count() shouldBe math.min(5L, counts(t))
      // the sampled rows are real table rows (not nulls/garbage): anti-join
      // against the DataFrame read must be empty
      five.exceptAll(sink.read(spark, t)).count() shouldBe 0L
    }
  }
}
