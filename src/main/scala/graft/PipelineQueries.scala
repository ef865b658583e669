package graft

import org.apache.spark.sql.{Observation, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.Etl
import graft.sinks.ParquetSink

/** Star-pipeline queries (E1: S4–S6, P3, O1): run the full drop → create →
  * stage → insert×5 build and verify the materialized outputs — both row
  * counts (the reference's validation queries) and the full content of the
  * fact table. The oracle replays the identical pipeline in DuckDB SQL
  * directly over the same JSON fixture files.
  */
object PipelineQueries {
  import Queries.Q

  val q13StarPipelineCounts: Q = (s, d) => {
    val counts = Etl.run(s, d)
    import s.implicits._
    Etl.tables.map(t => (t, counts(t))).toDF("table_name", "row_cnt")
  }

  /** Full readback of the materialized songplay parquet — hashes the actual
    * bytes the sink wrote (join fanout, null dim keys, presort included). */
  val q14StarSongplay: Q = (s, d) => {
    Etl.run(s, d)
    new ParquetSink(Etl.starRoot(d)).read(s, "songplay")
  }

  /** q233: in-flight audit metrics — A5 (the reference's five count(*)
    * validation queries, test_etl.ipynb cells 8–20) done WITHOUT a second
    * pass: `Dataset.observe` attaches audit aggregates (rows scanned,
    * constraint-violation counts) to the production scan itself, Spark
    * accumulates them alongside the real work, and the query ships the
    * production aggregate with the audit columns attached. At 100 TB this
    * is the only affordable validation shape — a separate `SELECT
    * count(*)` re-reads the table (the reference can afford it at 8k rows;
    * a re-scan of a 100 TB fact cannot ship with every load), whereas
    * observed metrics ride the exchange-free map side of the pass that ran
    * anyway, exactly like the sum/count partials the aggregate already
    * computes. The one `collect()` is the production OUTPUT (≤3 group
    * rows, metadata-sized — the established discipline): the action that
    * materializes it is what populates the Observation, so the audit
    * costs zero extra jobs. The oracle pays the honest two-pass price
    * (production aggregate CROSS JOIN audit scalars) — same answer, one
    * scan here, two there. */
  val q233ObserveAudit: Q = (s, d) => {
    val obs = Observation("q233_audit")
    val audited = Tables.lineitem(s, d).observe(obs,
      count(lit(1)).as("rows_scanned"),
      sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("bad_qty_rows"),
      sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("null_ship_rows"))
    val prod = audited.groupBy(col("l_returnflag")).agg(
      sum(col("l_quantity").cast(DecimalType(14, 2)))
        .cast(DoubleType).as("sum_qty"),
      count(lit(1)).as("n_rows"))
    val out = prod.collect()                 // the one action: fills obs too
    val m = obs.get
    val audit = Seq("rows_scanned", "bad_qty_rows", "null_ship_rows")
    s.createDataFrame(
      java.util.Arrays.asList(
        out.map(r => Row.fromSeq(r.toSeq ++ audit.map(m(_)))): _*),
      StructType(prod.schema.fields ++ audit.map(StructField(_, LongType))))
  }

  val queries: Map[String, Q] = Map(
    "q233_observe_audit"       -> q233ObserveAudit,
    "q13_star_pipeline_counts" -> q13StarPipelineCounts,
    "q14_star_songplay"        -> q14StarSongplay)

  private def evStage: String =
    s"""SELECT make_timestamp(tsMillis * 1000) AS ts,
       |    CAST(userIdStr AS INTEGER) AS user_id,
       |    artistName, songTitle, CAST(songLenNum AS DECIMAL(12,4)) AS length,
       |    sessionId, levelStr, firstName, lastName, gender, locationStr, userAgentStr
       |  FROM ${IngestQueries.eventsReadJson(
            "tsMillis" -> "BIGINT", "userIdStr" -> "VARCHAR",
            "artistName" -> "VARCHAR", "songTitle" -> "VARCHAR",
            "songLenNum" -> "DOUBLE", "sessionId" -> "INTEGER",
            "levelStr" -> "VARCHAR", "firstName" -> "VARCHAR",
            "lastName" -> "VARCHAR", "gender" -> "VARCHAR",
            "locationStr" -> "VARCHAR", "userAgentStr" -> "VARCHAR")}""".stripMargin

  def oracle: Map[String, String] = Map(
    // The oracle pays the two-pass price the observe pattern avoids:
    // production aggregate CROSS JOIN the audit scalars over a re-scan.
    "q233_observe_audit" ->
      """SELECT p.l_returnflag, p.sum_qty, p.n_rows,
        |  a.rows_scanned, a.bad_qty_rows, a.null_ship_rows
        |FROM (SELECT l_returnflag,
        |        CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty,
        |        count(*) AS n_rows
        |      FROM lineitem GROUP BY 1) p
        |CROSS JOIN
        |  (SELECT count(*) AS rows_scanned,
        |     CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |       AS bad_qty_rows,
        |     CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |       AS null_ship_rows
        |   FROM lineitem) a""".stripMargin,
    "q13_star_pipeline_counts" ->
      s"""WITH ev AS ($evStage),
         |sg AS (SELECT * FROM ${IngestQueries.songsReadJson}),
         |sp AS (SELECT e.ts FROM ev e LEFT OUTER JOIN sg s
         |       ON s.artist_name = e.artistName AND s.title = e.songTitle
         |          AND s.duration = e.length),
         |us AS (SELECT DISTINCT user_id, firstName, lastName, gender
         |       FROM ev WHERE user_id IS NOT NULL),
         |so AS (SELECT DISTINCT song_id, title, artist_id, year, duration
         |       FROM sg WHERE song_id IS NOT NULL),
         |ar AS (SELECT DISTINCT artist_id, artist_name, artist_location,
         |         CAST(artist_latitude AS DECIMAL(11,8)) lat8,
         |         CAST(artist_longitude AS DECIMAL(11,8)) lon8
         |       FROM sg WHERE artist_id IS NOT NULL),
         |tm AS (SELECT DISTINCT ts FROM ev)
         |SELECT 'songplay' AS table_name, count(*) AS row_cnt FROM sp
         |UNION ALL SELECT 'users', count(*) FROM us
         |UNION ALL SELECT 'songs', count(*) FROM so
         |UNION ALL SELECT 'artists', count(*) FROM ar
         |UNION ALL SELECT 'time', count(*) FROM tm""".stripMargin,
    "q14_star_songplay" ->
      s"""WITH ev AS ($evStage),
         |sg AS (SELECT * FROM ${IngestQueries.songsReadJson})
         |SELECT e.ts AS start_time, e.user_id, e.levelStr AS level,
         |  s.song_id, s.artist_id, CAST(e.sessionId AS VARCHAR) AS session_id,
         |  e.locationStr AS location, e.userAgentStr AS user_agent
         |FROM ev e LEFT OUTER JOIN sg s
         |  ON s.artist_name = e.artistName AND s.title = e.songTitle
         |     AND s.duration = e.length""".stripMargin)
}
