package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Epoch, Tables}

/** Deterministic JSON fixtures for the ingestion queries (q11/q12).
  *
  * The driver testdata ships parquet only; the reference's input layer is
  * newline-delimited JSON on S3 (`sql_queries.py:121-128`). To exercise the
  * real JSON scan path we derive — once per scale factor, idempotently —
  * Sparkify-shaped JSON from the parquet tables, then read it back through
  * [[JsonSource]]. Content is a pure function of the testdata (no
  * timestamps/randomness), so verify and bench see identical files, and the
  * DuckDB oracle reads the very same files with `read_json`.
  */
object Fixtures {

  val root = "/root/repo/work/fixtures"

  private def sfName(sfDir: String): String =
    Paths.get(sfDir).getFileName.toString

  def eventsJsonDir(sfDir: String): String = s"$root/${sfName(sfDir)}/events_json"
  def songsJsonDir(sfDir: String): String  = s"$root/${sfName(sfDir)}/songs_json"

  private def done(dir: String): Boolean =
    Files.exists(Paths.get(dir, "_SUCCESS"))

  /** Raw schema of the events fixture — field names deliberately differ from
    * the target staging columns so the jsonpaths mapping does real renames
    * (the reference's log JSON uses camelCase, the warehouse snake_case). */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("eventId", LongType),
    StructField("tsMillis", LongType),          // epoch-ms (reference `ts`)
    StructField("registrationMs", DoubleType),  // FLOAT epoch-ms (reference `registration`)
    StructField("userIdStr", StringType),       // JSON string → int (reference `userId`)
    StructField("eventKind", StringType),
    StructField("valueNum", DoubleType),
    StructField("propsJson", StringType)))

  /** Log-style events JSON: epoch-ms long `tsMillis`, float epoch-ms
    * `registrationMs` (ts + 0.5ms fraction — exercises the float-ms floor),
    * string `userIdStr`. Written once per sf. */
  def ensureEventsJson(spark: SparkSession, sfDir: String): String = {
    val dir = eventsJsonDir(sfDir)
    if (!done(dir)) {
      val ms = Epoch.nanosToMillis(col("ts"))
      Tables.eventsRawNanos(spark, sfDir)
        .select(
          col("event_id").as("eventId"),
          ms.as("tsMillis"),
          (ms.cast(DoubleType) + lit(0.5)).as("registrationMs"),
          col("user_id").cast(StringType).as("userIdStr"),
          col("event_type").as("eventKind"),
          col("value").as("valueNum"),
          col("props").as("propsJson"))
        .write.mode("overwrite").json(dir)
    }
    dir
  }

  /** Million-Song-style songs JSON matching [[graft.schemas.Schemas.stagingSongs]]
    * field-for-field (the `json 'auto'` contract), including nullable
    * decimal lat/long and a DECIMAL(12,6) duration. Derived from `part`. */
  def ensureSongsJson(spark: SparkSession, sfDir: String): String = {
    val dir = songsJsonDir(sfDir)
    if (!done(dir)) {
      val p = Tables.part(spark, sfDir)
      p.select(
          lit(1).as("num_songs"),
          concat(lit("AR"), regexp_replace(col("p_brand"), "#", ""),
            lpad(col("p_partkey").cast(StringType), 8, "0")).as("artist_id"),
          when(pmod(col("p_partkey"), lit(7)) === 0, lit(null))
            .otherwise((pmod(col("p_retailprice"), lit(180.0)) - lit(90.0))
              .cast(DecimalType(11, 3))).as("artist_latitude"),
          when(pmod(col("p_partkey"), lit(11)) === 0, lit(null))
            .otherwise((pmod(col("p_retailprice") * 2, lit(360.0)) - lit(180.0))
              .cast(DecimalType(11, 3))).as("artist_longitude"),
          col("p_type").as("artist_location"),
          col("p_brand").as("artist_name"),
          concat(lit("SO"), lpad(col("p_partkey").cast(StringType), 8, "0")).as("song_id"),
          col("p_name").as("title"),
          col("p_retailprice").cast(DecimalType(12, 6)).as("duration"),
          (lit(1990) + pmod(col("p_size"), lit(30))).as("year"))
        .write.mode("overwrite").json(dir)
    }
    dir
  }
}
