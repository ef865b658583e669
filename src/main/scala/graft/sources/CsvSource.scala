package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** CSV ingestion — the COPY-from-CSV twin of [[JsonSource]] (the
  * reference's COPY layer is format-pluggable; `sql_queries.py:121-128`
  * shows the JSON modes, and Redshift's CSV mode is the same contract:
  * declared schema, explicit quoting, reject handling).
  *
  * Conventions baked in:
  *  - declared schema, never inference (an inference pass over 100 TB is a
  *    full extra scan);
  *  - RFC-4180 quoting (`""` doubling via quote=escape=`"`), so the files
  *    are readable by every standard CSV reader — including the DuckDB
  *    oracle;
  *  - empty string is NULL (the COPY `EMPTYASNULL` posture);
  *  - no multiLine: embedded newlines force whole-file parsing; a
  *    newline-free quoting discipline keeps scans splittable across tasks.
  */
object CsvSource {

  /** Strict typed scan: malformed lines are null-filled silently
    * (PERMISSIVE without capture) — use [[tolerant]] when rejects matter. */
  def typed(spark: SparkSession, path: String, schema: StructType): DataFrame =
    reader(spark, schema).csv(path)

  /** Audit-tolerant scan: each malformed line's raw text lands in
    * `corruptCol` (wrong arity, uncastable numerics, broken quoting), so
    * `filter(corruptCol.isNull)` is the clean staging input and
    * `filter(corruptCol.isNotNull)` the reject file. Same Spark planning
    * restriction as [[JsonSource.autoTolerant]]: never select ONLY the
    * corrupt column from the raw scan. And one CSV-specific footgun this
    * builder CLOSES rather than documents: under Spark's CSV column
    * pruning (default on) a query referencing a SUBSET of columns only
    * parses that subset, so a line whose damage lives in an unreferenced
    * column is silently NOT flagged — a pruned projection over a tolerant
    * scan (q190) would quarantine fewer rows than the full projection
    * (q170) over the SAME files. Reject semantics must be a property of
    * the DATA, not of the consuming query's column list, so tolerant
    * scans pin full-row parsing (idempotent conf, always the same value —
    * the [[graft.Tables.events]] nanosAsLong discipline). */
  def tolerant(spark: SparkSession, path: String, schema: StructType,
               corruptCol: String = "_corrupt_record"): DataFrame = {
    val k = "spark.sql.csv.parser.columnPruning.enabled"
    if (spark.conf.getOption(k).forall(_ != "false"))
      spark.conf.set(k, "false")
    reader(spark, schema.add(corruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path)
  }

  private def reader(spark: SparkSession, schema: StructType) =
    spark.read.schema(schema)
      .option("header", "false")
      .option("quote", "\"").option("escape", "\"")
      .option("nullValue", "")
}
