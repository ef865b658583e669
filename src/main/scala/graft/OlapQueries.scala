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

  /** q77: the SQL set operators over two corpus snapshots — the daily-crawl
    * diff ("which docs appeared / disappeared / persisted") plus the
    * multiset (ALL) variants over a non-unique projection, assembled into
    * one result by UNION ALL. Snapshots are deterministic hash-bucket
    * views of `documents` (A drops bucket 0, B drops bucket 1), so the
    * overlap and both diffs are non-trivial at every scale.
    *
    * Plan shape: Spark compiles INTERSECT/EXCEPT to left-semi/anti joins
    * over distinct inputs and INTERSECT ALL/EXCEPT ALL to the
    * count-replicating aggregate form — all keyed shuffles, no cartesian;
    * the UNION ALL glue is shuffle-free concatenation. The doc_id-keyed
    * branches hash on the unique key; the multiset branches hash on
    * (lang, source) — 25 groups, collapsed map-side before the exchange. */
  val q77SetOps: Q = (s, d) => {
    val bucket = pmod(graft.operators.TextOps.hash60(
      col("doc_id").cast(StringType)), lit(5))
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"), bucket.as("bkt"))
    val a = docs.filter(col("bkt") =!= 0).drop("bkt")
    val b = docs.filter(col("bkt") =!= 1).drop("bkt")
    def tag(op: String, df: org.apache.spark.sql.DataFrame) =
      df.select(lit(op).as("op"), col("doc_id"), col("lang"), col("source"))
    val nullId = lit(null).cast(LongType).as("doc_id")
    def tagMix(op: String, df: org.apache.spark.sql.DataFrame) =
      df.select(lit(op).as("op"), nullId, col("lang"), col("source"))
    val mixA = a.select(col("lang"), col("source"))
    val mixB = b.select(col("lang"), col("source"))
    tag("only_a", a.except(b))
      .unionByName(tag("only_b", b.except(a)))
      .unionByName(tag("common", a.intersect(b)))
      .unionByName(tagMix("mix_intersect_all", mixA.intersectAll(mixB)))
      .unionByName(tagMix("mix_except_all", mixA.exceptAll(mixB)))
  }

  val queries: Map[String, Q] = Map(
    "q58_rollup"       -> q58Rollup,
    "q59_pivot"        -> q59Pivot,
    "q60_json_extract" -> q60JsonExtract,
    "q71_cube"         -> q71Cube,
    "q77_set_ops"      -> q77SetOps)

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
        |FROM documents GROUP BY CUBE (lang, source)""".stripMargin,
    // Identical snapshot split (md5 hash-bucket), identical set algebra.
    "q77_set_ops" ->
      """WITH s AS (SELECT doc_id, lang, source,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) % 5
        |      AS bkt FROM documents),
        |a AS (SELECT doc_id, lang, source FROM s WHERE bkt <> 0),
        |b AS (SELECT doc_id, lang, source FROM s WHERE bkt <> 1)
        |SELECT 'only_a' AS op, doc_id, lang, source
        |  FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
        |UNION ALL SELECT 'only_b', doc_id, lang, source
        |  FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
        |UNION ALL SELECT 'common', doc_id, lang, source
        |  FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
        |UNION ALL SELECT 'mix_intersect_all', CAST(NULL AS BIGINT), lang, source
        |  FROM (SELECT lang, source FROM a INTERSECT ALL SELECT lang, source FROM b)
        |UNION ALL SELECT 'mix_except_all', CAST(NULL AS BIGINT), lang, source
        |  FROM (SELECT lang, source FROM a EXCEPT ALL SELECT lang, source FROM b)""".stripMargin)
}
