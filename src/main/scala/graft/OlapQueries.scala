package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Classic OLAP surface beyond the reference's own queries: multi-level
  * rollup aggregation, pivot (columnar cross-tab), and semi-structured
  * JSON-column extraction. All are single-aggregation plans whose heavy
  * stage collapses map-side; the pivot's column set is a FIXED literal
  * list (never inferred from data — an inferred pivot is a driver-side
  * distinct scan of the corpus).
  */
object OlapQueries {
  import Queries.Q

  /** q58: ROLLUP over (lang, source) — per-(lang,source), per-lang, and
    * grand-total document counts and token sums in one pass. Spark plans
    * a rollup as an Expand (one replicated row per grouping set) feeding
    * ONE partial-aggregated shuffle — the multi-level report without
    * three scans or a union. */
  val q58Rollup: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("lang"), col("source"),
        size(graft.operators.TextOps.words(col("text"))).as("wc"))
      .rollup(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("wc")).as("total_tokens"))

  /** q59: pivot — events cross-tabbed as one row per user-id bucket with
    * one count column per event type. The pivot values are a fixed
    * literal list, so Spark plans the two-phase PivotFirst aggregation
    * without any data-driven column inference (an unvalued pivot would
    * first run a driver-side distinct scan). Spark's pivot leaves empty
    * cells NULL where SQL conditional counts yield 0 — na.fill aligns
    * the two. `%` (not pmod) matches the oracle's remainder semantics
    * for negative ids. */
  private val EVENT_TYPES = Seq("click", "error", "purchase", "signup", "view")

  val q59Pivot: Q = (s, d) =>
    Tables.events(s, d)
      .select((col("user_id") % 10).as("user_bucket"), col("event_type"))
      .groupBy(col("user_bucket"))
      .pivot("event_type", EVENT_TYPES)
      .count()
      .na.fill(0L, EVENT_TYPES)

  /** q60: semi-structured extraction — `events.props` is a JSON string;
    * pull `$.k` out as an int and aggregate it per event type. In-scan
    * path extraction (get_json_object), no UDF, no full JSON parse into
    * a struct for a single field. */
  val q60JsonExtract: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"),
        sum(col("k").cast(LongType)).as("sum_k"),
        max(col("k")).as("max_k"))

  /** q71: CUBE over (lang, source) — q58's rollup covers the hierarchy
    * prefixes; CUBE adds the per-source-across-all-langs slice (the 2^k
    * grouping-set lattice). The `grouping()` marker columns disambiguate a
    * REAL NULL group key from a subtotal row — the textbook reporting trap:
    * without them a NULL-lang document's row is indistinguishable from the
    * all-langs subtotal. Same Expand-then-one-shuffle plan as rollup (4
    * grouping sets here): one corpus pass for the whole lattice, vs four
    * scans + a union by hand. */
  val q71Cube: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("lang"), col("source"),
        size(graft.operators.TextOps.words(col("text"))).as("wc"))
      .cube(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("wc")).as("total_tokens"),
        grouping(col("lang")).cast(IntegerType).as("lang_subtotal"),
        grouping(col("source")).cast(IntegerType).as("source_subtotal"))

  val queries: Map[String, Q] = Map(
    "q58_rollup"       -> q58Rollup,
    "q59_pivot"        -> q59Pivot,
    "q60_json_extract" -> q60JsonExtract,
    "q71_cube"         -> q71Cube)

  val oracle: Map[String, String] = Map(
    "q58_rollup" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
        |    AS total_tokens
        |FROM documents GROUP BY ROLLUP (lang, source)""".stripMargin,
    // Fixed-list conditional aggregation — the portable pivot spelling.
    "q59_pivot" ->
      s"""SELECT user_id % 10 AS user_bucket,
         |${OlapQueries.EVENT_TYPES.map(t =>
             s"  count(*) FILTER (WHERE event_type = '$t') AS $t").mkString(",\n")}
         |FROM events GROUP BY 1""".stripMargin,
    "q60_json_extract" ->
      """SELECT event_type,
        |  count(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS n_with_k,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |  max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    "q71_cube" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
        |    AS total_tokens,
        |  CAST(grouping(lang) AS INTEGER) AS lang_subtotal,
        |  CAST(grouping(source) AS INTEGER) AS source_subtotal
        |FROM documents GROUP BY CUBE (lang, source)""".stripMargin)
}
