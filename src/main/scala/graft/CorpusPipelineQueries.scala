package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Dedup, TextOps}

/** q39: the composed corpus-curation pipeline — the LLM-data analog of the
  * reference's star build (E1): score → filter → exact-dedup (keep first)
  * → stratified sample → shard. One flow, four operators, each already
  * verified standalone (q15/q20/q31/q37); this entry verifies their
  * COMPOSITION end-to-end against a single SQL replay.
  *
  * Scale shape: score+filter are in-scan; dedup is one window shuffle on
  * the content digest (keep-first via row_number, the standard pattern —
  * no self-join); sampling is a stateless filter; the shard id is a
  * projection. Total: ONE shuffle for the whole curation pass.
  */
object CorpusPipelineQueries {
  import Queries.Q

  private val MIN_QUALITY = 0.38
  private val N_SHARDS = 8

  val q39CorpusPipeline: Q = (s, d) => {
    // The SAME score definition q15 verifies standalone — shared builder,
    // so the composed pipeline can never drift from the verified operator.
    val scored = Tables.documentsDistributed(s, d)
      .select(col("doc_id"), col("lang"), col("text"),
        TextQueries.qualityScore(col("text")).as("quality_score"))
      .filter(col("quality_score") >= MIN_QUALITY)

    // Exact dedup, keep-first: one window shuffle on the content digest.
    val deduped = scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(Dedup.normalizedHash(col("text"))).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)

    val bucket = pmod(TextOps.hash60(col("doc_id").cast(StringType)), lit(100))
    val rate = SampleQueries.rateCol(col("lang"))
    val shard = pmod(
      TextOps.hash60(concat(lit("shard:"), col("doc_id").cast(StringType))), lit(N_SHARDS))
    deduped
      .filter(bucket < rate)
      .select(col("doc_id"), col("lang"), col("quality_score"),
        (lit(100.0) / rate.cast(DoubleType)).as("weight"),
        shard.cast(IntegerType).as("shard"))
  }

  /** q93: rare-combination suppression — the k-anonymity generalization
    * gate a privacy-conscious pipeline runs on quasi-identifier columns
    * before release: any (lang, source) combination carried by fewer than
    * K documents is generalized (source → '*'), because a rare combination
    * IS an identifier even when each column alone is harmless. Emits every
    * doc with its (possibly generalized) source, the combination's
    * population, and the suppression flag — the auditable form (a silent
    * drop would bias the corpus; a flagged generalization is reversible
    * policy).
    *
    * Scale shape: one (lang, source) count aggregation — combination
    * cardinality, not corpus cardinality — broadcast back onto the corpus
    * (the q49 feedback pattern); the per-doc frame never shuffles. */
  private val K_ANON = 5

  val q93RareSuppress: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val combos = docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("group_n"))
    docs.join(broadcast(combos), Seq("lang", "source"))
      .select(col("doc_id"), col("lang"),
        when(col("group_n") >= K_ANON, col("source")).otherwise(lit("*"))
          .as("source_out"),
        col("group_n"),
        (col("group_n") < K_ANON).as("suppressed"))
  }

  val queries: Map[String, Q] = Map(
    "q39_corpus_pipeline" -> q39CorpusPipeline,
    "q93_rare_suppress"   -> q93RareSuppress)

  private def md60(e: String) =
    s"CAST(('0x' || substr(md5($e), 1, 15)) AS UBIGINT)"

  val oracle: Map[String, String] = Map(
    "q93_rare_suppress" ->
      s"""WITH g AS (SELECT lang, source, count(*) AS group_n
         |  FROM documents GROUP BY 1, 2)
         |SELECT doc_id, d.lang,
         |  CASE WHEN group_n >= $K_ANON THEN d.source ELSE '*' END AS source_out,
         |  group_n, group_n < $K_ANON AS suppressed
         |FROM documents d JOIN g ON d.lang = g.lang AND d.source = g.source""".stripMargin,
    "q39_corpus_pipeline" ->
      s"""WITH t AS (SELECT doc_id, lang, text,
         |    regexp_split_to_array(trim(text), '\\s+') AS w,
         |    length(text) AS char_len,
         |    length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS punct_cnt
         |  FROM documents),
         |sc AS (SELECT doc_id, lang, text,
         |    ${TextQueries.qualityScoreSql("w", "punct_cnt", "char_len")}
         |      AS quality_score
         |  FROM t),
         |filt AS (SELECT * FROM sc WHERE quality_score >= $MIN_QUALITY),
         |dd AS (SELECT *, row_number() OVER (
         |    PARTITION BY md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
         |    ORDER BY doc_id) AS rn FROM filt),
         |sampled AS (SELECT doc_id, lang, quality_score,
         |    CASE WHEN lang = 'en' THEN 40 WHEN lang = 'de' THEN 100
         |         WHEN lang = 'es' THEN 100 WHEN lang = 'fr' THEN 100
         |         WHEN lang = 'zh' THEN 80 ELSE 0 END AS rate
         |  FROM dd WHERE rn = 1)
         |SELECT doc_id, lang, quality_score,
         |  100.0::DOUBLE / CAST(rate AS DOUBLE) AS weight,
         |  CAST(${md60("'shard:' || CAST(doc_id AS VARCHAR)")} % $N_SHARDS AS INTEGER) AS shard
         |FROM sampled
         |WHERE ${md60("CAST(doc_id AS VARCHAR)")} % 100 < rate""".stripMargin)
}
