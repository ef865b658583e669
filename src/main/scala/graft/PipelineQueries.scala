package graft

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

  val queries: Map[String, Q] = Map(
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
