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
    * corrupt column from the raw scan. And one CSV-specific footgun:
    * under `spark.sql.csv.parser.columnPruning.enabled` (default true) a
    * query that references a SUBSET of columns only parses that subset, so
    * a line whose damage lives in an unreferenced column is NOT flagged —
    * the corrupt split is only complete when all columns are referenced
    * (as q170 does) or the scan is cache()d before splitting (as the spec
    * does). */
  def tolerant(spark: SparkSession, path: String, schema: StructType,
               corruptCol: String = "_corrupt_record"): DataFrame =
    reader(spark, schema.add(corruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path)

  private def reader(spark: SparkSession, schema: StructType) =
    spark.read.schema(schema)
      .option("header", "false")
      .option("quote", "\"").option("escape", "\"")
      .option("nullValue", "")
}
