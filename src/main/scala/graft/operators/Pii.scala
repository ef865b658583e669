package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction (LLM-data-pipeline text-curation family).
  *
  * Pattern-based scrubbing of the three high-volume PII shapes a web corpus
  * carries — emails, phone numbers, IPv4 addresses — as pure codegen'd
  * regex projections: per-document match counts (for filtering and audit
  * stats) and a redacted text with typed placeholder tokens (for training
  * output). No UDFs, no shuffle — the operator is scan-fused and scales
  * linearly with corpus bytes, the only acceptable cost model for a pass
  * that must touch 100 TB of raw text.
  *
  * Patterns are deliberately ASCII/RE2-safe so the DuckDB oracle evaluates
  * the identical automaton; redaction order is fixed (email → ip → phone)
  * and counts are taken BEFORE redaction so the two never interact.
  */
object Pii {

  val EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IPV4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PHONE = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  def emailCount(text: Column): Column = regexp_count(text, lit(EMAIL))
  def ipCount(text: Column): Column = regexp_count(text, lit(IPV4))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PHONE))

  /** Redact in fixed order: emails first (their digits could otherwise be
    * clipped into phone-shaped remnants), then IPs (dotted digits), then
    * phones. Placeholders carry no digits, so later passes can't re-match
    * earlier replacements. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EMAIL, "[EMAIL]"),
        IPV4, "[IP]"),
      PHONE, "[PHONE]")
}
