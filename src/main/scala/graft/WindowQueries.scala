package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.EventStream

/** Windowed/time-series queries over `events` (extension family: the
  * reference has no window functions — SURVEY.md §2.5 — but a streaming
  * engine needs them; both run identically in batch and via Structured
  * Streaming, see [[graft.streaming.EventStream]]). */
object WindowQueries {
  import Queries.Q

  /** q26: tumbling 1-hour window counts + exact decimal sums per event
    * type — the exact batch twin of the streaming windowedAgg (same
    * function builds both plans). */
  val q26WindowedAgg: Q = (s, d) =>
    EventStream.windowedAgg(Tables.events(s, d))

  /** q27: batch sessionization via analytic window functions — per user,
    * a session breaks after a 30-minute gap; classic lag + running-sum
    * session ids, then per-session aggregates. One shuffle on user_id
    * (partitioned sort, no global sort); the streaming twin is
    * [[EventStream.sessionize]] with equivalent gap semantics. */
  val q27Sessionize: Q = (s, d) => {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gapMs = 30L * 60000L
    Tables.events(s, d)
      .select(col("user_id"), col("ts"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_millis(col("ts")) - unix_millis(col("prev_ts"))) > gapMs, 1)
          .otherwise(0))
      .withColumn("session_no", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  val queries: Map[String, Q] = Map(
    "q26_windowed_agg" -> q26WindowedAgg,
    "q27_sessionize"   -> q27Sessionize)

  val oracle: Map[String, String] = Map(
    "q26_windowed_agg" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS t, event_type, value FROM events),
        |b AS (SELECT make_timestamp((epoch_ms(t) // 3600000) * 3600000 * 1000) AS ws,
        |        event_type, value FROM e)
        |SELECT ws AS window_start, ws + INTERVAL 1 HOUR AS window_end, event_type,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM b GROUP BY ws, event_type""".stripMargin,
    "q27_sessionize" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |l AS (SELECT user_id, ts,
        |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts FROM e),
        |n AS (SELECT user_id, ts,
        |        CASE WHEN prev_ts IS NULL
        |               OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000 THEN 1
        |             ELSE 0 END AS new_session FROM l),
        |s AS (SELECT user_id, ts,
        |        sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no FROM n)
        |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, session_no""".stripMargin)
}
