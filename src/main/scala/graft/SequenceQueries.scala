package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, StringType}

import graft.operators.{PrefixScan, TextOps}

/** Ordered / sequential analytics over the `events` stream — the family of
  * operators whose semantics are defined by a ROW ORDER, not a grouping:
  * sweep-line concurrency (q192), interval-union coverage (q193),
  * non-associative per-key state scans (q194), and a global
  * arrival-order watermark audit (q196).
  *
  * These are the operators that tempt a single global sort (or a
  * driver-side loop) in a naive engine. The discipline here:
  *  - a GLOBAL order is scanned with [[graft.operators.PrefixScan]] — the
  *    two-stage bucket scan whose single-partition frame holds bucket
  *    summaries, never rows (q192, q196);
  *  - a PER-KEY order uses one hash exchange + within-partition sort — a
  *    partitioned window (q193) or a sorted-group iterator stream (q194,
  *    `flatMapSortedGroups`: O(1) state per key, the group never
  *    materializes as an array);
  *  - every quantity is exact integer microseconds / cents (the
  *    `DECIMAL(18,2) * 100` idiom), so results are bit-identical under any
  *    partitioning, and the DuckDB oracle replays them hash-exact.
  *
  * Interval model shared by q192/q193: each event opens a half-open
  * interval [ts, ts + 10ms·cents(value)) — a deterministic, data-derived
  * duration (a 100.00-value event runs 100 s). Half-open means an interval
  * ending exactly when another starts does NOT overlap it: the sweep
  * orders (-1) deltas before (+1) at equal instants, and coverage merges
  * islands only when start ≤ running max end.
  */
object SequenceQueries {
  import Queries.Q

  private val US_PER_DAY = 86400000000L
  private val CAP_CENTS = 20000L
  private val DROP_US = 3600000000L // 1 h — the streaming watermark delay

  /** Exact integer cents of `value` (the q183 idiom). */
  private def cents(c: Column): Column =
    (c.cast(DecimalType(18, 2)) * 100).cast(LongType)

  /** (event_type, user_id, event_id, s_us, e_us): the shared half-open
    * interval model. 10 ms per cent keeps everything in exact BIGINT
    * microseconds. */
  private def intervals(s: SparkSession, d: String) =
    Tables.events(s, d).select(
      col("event_type"), col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("s_us"),
      (unix_micros(col("ts")) + cents(col("value")) * 10000L).as("e_us"))

  /** q192: PEAK CONCURRENCY per event type — the sweep-line classic ("max
    * simultaneous sessions", capacity planning, connection-pool sizing).
    * Each interval contributes a +1 at its start and a -1 at its end; the
    * peak is the maximum of the running delta sum along the global
    * (t_us, delta, event_id) order — ends sort before starts at equal
    * instants, the half-open contract.
    *
    * The running sum is [[PrefixScan]] with DAY buckets: within-day scans
    * are partitioned windows, cross-day carry is a per-type prefix over
    * |days| bucket totals — no single-partition pass over the data ever
    * happens (PlanSpec pins it), which is what lets the sweep survive a
    * 100 TB year of events. Output: peak concurrency and the first
    * instant it is reached (min over an exact integer column — both
    * deterministic). */
  val q192PeakConcurrency: Q = (s, d) => {
    val iv = intervals(s, d)
    val deltas = iv.select(col("event_type"), col("s_us").as("t_us"),
        lit(1L).as("delta"), col("event_id"))
      .unionByName(iv.select(col("event_type"), col("e_us").as("t_us"),
        lit(-1L).as("delta"), col("event_id")))
    val run = PrefixScan.running(deltas, Seq("event_type"),
      expr(s"t_us div $US_PER_DAY"),
      Seq(col("t_us"), col("delta"), col("event_id")), col("delta"),
      "sum", "running", exclusive = false)
    // ONE pass over the sweep: the peak and its first instant come from a
    // lexicographic max over (running, -t_us) — no second scan, no
    // peak-filter join — and the interval count rides the same aggregation
    // as a count of the +1 deltas.
    run.groupBy(col("event_type"))
      .agg(sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_intervals"),
        max(struct(col("running").as("r"), (-col("t_us")).as("nt"))).as("pk"))
      .select(col("event_type"), col("n_intervals"),
        col("pk.r").as("peak"), (-col("pk.nt")).as("peak_at_us"))
  }

  /** q193: INTERVAL-UNION COVERAGE per user — how much wall-clock was
    * covered by ≥1 interval (billable time, active time, sensor uptime),
    * overlaps merged. Gaps-and-islands: a row opens a new island iff its
    * start exceeds the running max end of everything before it (strictly
    * — half-open intervals that touch merge); island id is the running
    * count of opens; coverage sums max(e)−min(s) per island.
    *
    * ONE hash exchange total: the window partitions by user_id, and both
    * downstream aggregations key on supersets of user_id, so Catalyst
    * reuses the partitioning (plan-pinned). Per-user state is bounded by
    * that user's rows — the skewed-entity cost model of q50. */
  val q193IntervalCoverage: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("s_us"), col("e_us"), col("event_id"))
    val flagged = intervals(s, d)
      .withColumn("prev_max_e",
        max(col("e_us")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("opens",
        when(col("prev_max_e").isNull || col("s_us") > col("prev_max_e"), 1L)
          .otherwise(0L))
      .withColumn("island",
        sum(col("opens")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("n"), (max(col("e_us")) - min(col("s_us"))).as("len_us"))
      .groupBy(col("user_id"))
      .agg(sum(col("n")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("len_us")).as("covered_us"),
        max(col("len_us")).as("longest_us"))
  }

  /** q194: CLAMPED RUNNING BALANCE per user — the canonical
    * NON-ASSOCIATIVE scan (inventory with stockouts, a prepaid wallet, a
    * rate-limiter token bucket): balance_t = clamp(balance_{t−1} + Δ_t,
    * [0, cap]). No window frame or prefix monoid expresses a clamp — the
    * fold genuinely depends on every prior step — so this is the honest
    * home of the SECONDARY-SORT pattern: `groupByKey(user)` +
    * `flatMapSortedGroups(event_id)` streams each user's events, in
    * order, through O(1) mutable state. No collect_list (the group never
    * materializes), no driver loop, one hash exchange + per-partition
    * sort — a skewed user costs its own partition run, nothing global.
    * Credits: purchase/signup cents; debits: click/view/error cents.
    *
    * The DuckDB oracle replays the fold as a genuinely recursive CTE (one
    * step per event rank — an INDEPENDENT mechanism), pinning final
    * balance AND both clamp counters hash-exact. */
  val q194ClampedBalance: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d).select(
      col("user_id"), col("event_id"),
      when(col("event_type").isin("purchase", "signup"), cents(col("value")))
        .otherwise(-cents(col("value"))).as("delta"))
      .as[(Long, Long, Long)]
    ev.groupByKey(_._1)
      .flatMapSortedGroups(col("event_id")) { (user, rows) =>
        var bal = 0L; var floorHits = 0L; var capHits = 0L; var n = 0L
        rows.foreach { case (_, _, delta) =>
          val x = bal + delta
          if (x < 0L) { bal = 0L; floorHits += 1 }
          else if (x > CAP_CENTS) { bal = CAP_CENTS; capHits += 1 }
          else bal = x
          n += 1
        }
        Iterator((user, bal, floorHits, capHits, n))
      }
      .toDF("user_id", "final_cents", "floor_hits", "cap_hits", "n_events")
  }

  /** q196: WATERMARK / LATE-DATA AUDIT — the batch measurement that sizes
    * a streaming deployment's watermark delay. Arrival order is a
    * deterministic shuffled-within-day replay (day of ts, then
    * hash60("arr:"||event_id) — the ingest reality where a day's files
    * land unordered); the running watermark is the prefix MAX of ts along
    * that arrival order, and a row is late by (wm − ts) when it arrives
    * behind the watermark. Per type: how many late, how late, and how
    * many a 1-hour `withWatermark` would have DROPPED — measured on the
    * real data, which is how the EventStream horizon should be chosen.
    *
    * The global prefix max is the same [[PrefixScan]] shape as q192 with
    * the max monoid and day buckets; nothing single-partition touches row
    * data (plan-pinned alongside q192). */
  val q196WatermarkAudit: Q = (s, d) => {
    val arr = Tables.events(s, d).select(
        col("event_type"), col("event_id"), unix_micros(col("ts")).as("t_us"))
      .withColumn("h", TextOps.hash60(
        concat(lit("arr:"), col("event_id").cast(StringType))))
    val wm = PrefixScan.running(arr, Seq.empty,
      expr(s"t_us div $US_PER_DAY"),
      Seq(col("h"), col("event_id")), col("t_us"),
      "max", "wm_us", exclusive = true)
    wm.withColumn("late_us",
        when(col("wm_us").isNull || col("wm_us") <= col("t_us"), 0L)
          .otherwise(col("wm_us") - col("t_us")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late_us") > 0L, 1L).otherwise(0L)).as("n_late"),
        sum(col("late_us")).as("sum_late_us"),
        max(col("late_us")).as("max_late_us"),
        sum(when(col("late_us") > DROP_US, 1L).otherwise(0L)).as("n_dropped"))
  }

  val queries: Map[String, Q] = Map(
    "q192_peak_concurrency" -> q192PeakConcurrency,
    "q193_interval_coverage" -> q193IntervalCoverage,
    "q194_clamped_balance" -> q194ClampedBalance,
    "q196_watermark_audit" -> q196WatermarkAudit)

  private val ivSql =
    """SELECT event_type, user_id, event_id, epoch_us(ts) AS s_us,
      |    epoch_us(ts) + CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      * 10000 AS e_us
      |  FROM events""".stripMargin

  val oracle: Map[String, String] = Map(
    // The oracle runs the sweep as ONE unpartitioned-ish window (DuckDB
    // can afford it at gate scale); the engine's bucketed two-stage scan
    // must land on identical integers.
    "q192_peak_concurrency" ->
      s"""WITH iv AS ($ivSql),
         |deltas AS (
         |  SELECT event_type, s_us AS t_us, 1 AS delta, event_id FROM iv
         |  UNION ALL
         |  SELECT event_type, e_us AS t_us, -1 AS delta, event_id FROM iv),
         |run AS (
         |  SELECT event_type, t_us,
         |    CAST(sum(delta) OVER (PARTITION BY event_type
         |      ORDER BY t_us, delta, event_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running
         |  FROM deltas),
         |pk AS (SELECT event_type, max(running) AS peak FROM run GROUP BY 1),
         |cnt AS (SELECT event_type, count(*) AS n_intervals FROM iv GROUP BY 1),
         |at AS (
         |  SELECT r.event_type, min(p.peak) AS peak, min(r.t_us) AS peak_at_us
         |  FROM run r JOIN pk p
         |    ON r.event_type = p.event_type AND r.running = p.peak
         |  GROUP BY r.event_type)
         |SELECT a.event_type, c.n_intervals, a.peak, a.peak_at_us
         |FROM at a JOIN cnt c ON a.event_type = c.event_type""".stripMargin,
    "q193_interval_coverage" ->
      s"""WITH iv AS ($ivSql),
         |flagged AS (
         |  SELECT user_id, event_id, s_us, e_us,
         |    CASE WHEN max(e_us) OVER w IS NULL
         |           OR s_us > max(e_us) OVER w THEN 1 ELSE 0 END AS opens
         |  FROM iv
         |  WINDOW w AS (PARTITION BY user_id ORDER BY s_us, e_us, event_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         |islands AS (
         |  SELECT user_id, s_us, e_us,
         |    sum(opens) OVER (PARTITION BY user_id
         |      ORDER BY s_us, e_us, event_id
         |      ROWS UNBOUNDED PRECEDING) AS island
         |  FROM flagged),
         |per_island AS (
         |  SELECT user_id, island, count(*) AS n,
         |    max(e_us) - min(s_us) AS len_us
         |  FROM islands GROUP BY user_id, island)
         |SELECT user_id, CAST(sum(n) AS BIGINT) AS n_intervals,
         |  count(*) AS n_islands, CAST(sum(len_us) AS BIGINT) AS covered_us,
         |  max(len_us) AS longest_us
         |FROM per_island GROUP BY user_id""".stripMargin,
    // A genuinely recursive replay — the fold advances one event rank per
    // iteration, carrying (balance, floor_hits, cap_hits) — nothing like
    // the engine's sorted-group stream, which is the point.
    "q194_clamped_balance" ->
      s"""WITH RECURSIVE ev AS (
         |  SELECT user_id, event_id,
         |    CASE WHEN event_type IN ('purchase', 'signup')
         |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      ELSE -CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END
         |      AS delta,
         |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
         |  FROM events),
         |walk AS (
         |  SELECT user_id, rn,
         |    CASE WHEN delta < 0 THEN 0
         |         WHEN delta > $CAP_CENTS THEN $CAP_CENTS
         |         ELSE delta END AS bal,
         |    CASE WHEN delta < 0 THEN 1 ELSE 0 END AS floor_hits,
         |    CASE WHEN delta > $CAP_CENTS THEN 1 ELSE 0 END AS cap_hits
         |  FROM ev WHERE rn = 1
         |  UNION ALL
         |  SELECT e.user_id, e.rn,
         |    CASE WHEN w.bal + e.delta < 0 THEN 0
         |         WHEN w.bal + e.delta > $CAP_CENTS THEN $CAP_CENTS
         |         ELSE w.bal + e.delta END,
         |    w.floor_hits + CASE WHEN w.bal + e.delta < 0 THEN 1 ELSE 0 END,
         |    w.cap_hits + CASE WHEN w.bal + e.delta > $CAP_CENTS
         |                 THEN 1 ELSE 0 END
         |  FROM walk w JOIN ev e
         |    ON e.user_id = w.user_id AND e.rn = w.rn + 1),
         |last AS (SELECT user_id, max(rn) AS mx FROM ev GROUP BY user_id)
         |SELECT w.user_id, w.bal AS final_cents,
         |  CAST(w.floor_hits AS BIGINT) AS floor_hits,
         |  CAST(w.cap_hits AS BIGINT) AS cap_hits,
         |  CAST(l.mx AS BIGINT) AS n_events
         |FROM walk w JOIN last l ON w.user_id = l.user_id AND w.rn = l.mx""".stripMargin,
    "q196_watermark_audit" ->
      s"""WITH arr AS (
         |  SELECT event_type, event_id, epoch_us(ts) AS t_us,
         |    epoch_us(ts) // $US_PER_DAY AS day,
         |    CAST(CAST(('0x' || substr(md5('arr:' || CAST(event_id AS VARCHAR)),
         |      1, 15)) AS UBIGINT) AS BIGINT) AS h
         |  FROM events),
         |wm AS (
         |  SELECT event_type, t_us,
         |    max(t_us) OVER (ORDER BY day, h, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm_us
         |  FROM arr),
         |late AS (
         |  SELECT event_type,
         |    CASE WHEN wm_us IS NULL OR wm_us <= t_us THEN 0
         |         ELSE wm_us - t_us END AS late_us
         |  FROM wm)
         |SELECT event_type, count(*) AS n_events,
         |  CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_late,
         |  CAST(sum(late_us) AS BIGINT) AS sum_late_us,
         |  max(late_us) AS max_late_us,
         |  CAST(sum(CASE WHEN late_us > $DROP_US THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dropped
         |FROM late GROUP BY event_type""".stripMargin)
}
