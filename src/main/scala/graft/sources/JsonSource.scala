package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.{IntegerType, StructType}

/** JSON ingestion (reference: the two COPY modes, SURVEY.md §2.1 S1/S2).
  *
  *  - [[JsonSource.jsonpaths]] mirrors `COPY … json '<jsonpaths file>'`
  *    (`sql_queries.py:121-124`): the raw JSON is read with a *declared*
  *    schema, then a field→column mapping projects/renames/casts each raw
  *    field into the staging shape — a jsonpaths file is exactly such a map.
  *  - [[JsonSource.auto]] mirrors `COPY … json 'auto'`
  *    (`sql_queries.py:126-128`): name-matched load against a declared
  *    schema, no mapping step.
  *
  * Scale notes: Spark splits newline-delimited JSON across tasks the same
  * way Redshift's COPY fans out across slices; the declared schema avoids
  * the inference pass, and because the mapping is a plain projection it is
  * whole-stage-codegen'd and column-pruned by Catalyst (unreferenced raw
  * fields are never parsed — `ReadSchema` shows only mapped fields).
  */
object JsonSource {

  /** Read newline-delimited JSON with a declared raw schema, then apply a
    * jsonpaths-style field→column mapping. `mapping` entries are
    * (targetColumn, expression-over-raw-fields). */
  def jsonpaths(spark: SparkSession, path: String, raw: StructType,
                mapping: Seq[(String, Column)]): DataFrame =
    spark.read.schema(raw).json(path)
      .select(mapping.map { case (name, c) => c.as(name) }: _*)

  /** Read newline-delimited JSON, name-matched against a declared schema. */
  def auto(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Audit-tolerant variant of [[auto]]. Three load postures exist:
    * FAILFAST aborts on the first bad line (the reference's COPY with
    * maxerror 0 — a 100 TB ingest cannot); default PERMISSIVE (what
    * [[auto]] does) silently null-fills malformed lines — corrupt input
    * flows into staging UNDETECTED; this variant captures each bad line's
    * raw text in `corruptCol`, so rejects are auditable:
    * `filter(col(corruptCol).isNull)` is the clean staging input,
    * `filter(col(corruptCol).isNotNull)` the reject file (Redshift's
    * stl_load_errors, as a DataFrame).
    *
    * Spark restriction: a query whose only REQUIRED column from the raw
    * JSON scan is the corrupt column throws at planning time —
    * `cache()`/persist the returned frame (as the spec does) or select a
    * data column alongside it before computing the reject split. */
  def autoTolerant(spark: SparkSession, path: String, schema: StructType,
      corruptCol: String = "_corrupt_record"): DataFrame = {
    // idempotent if the caller's schema already declares the column
    val full = if (schema.fieldNames.contains(corruptCol)) schema
      else schema.add(corruptCol, org.apache.spark.sql.types.StringType)
    spark.read
      .schema(full)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }

  /** Redshift-COPY-style lenient string→int for scan-time casts (X7): the
    * Sparkify logs carry `"userId": ""` for anonymous sessions, which lands
    * as NULL in the int staging column. Spark 4's ANSI cast throws on ''; a
    * try_cast reproduces the load-time semantics. */
  def intOrNull(c: Column): Column = c.try_cast(IntegerType)
}
