package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL / domain operators (LLM-data-pipeline text-curation family): extract
  * every URL in a document, reduce to registrable-host strings, and flag
  * documents touching a domain blocklist — the standard web-corpus
  * source-filtering pass (block spam/SEO/adult domains before training).
  *
  * Pure codegen'd regex + array projections in the scan: no UDFs, no
  * shuffle, linear in corpus bytes. The domain blocklist is a literal array
  * (at real scale: a broadcast join against a blocklist table — same plan
  * shape with the list side broadcast, still zero corpus shuffle).
  */
object Urls {

  /** RE2/Java-compatible: scheme + host, optional path up to whitespace. */
  val URL = "https?://[A-Za-z0-9.-]+(/[^\\s]*)?"
  val HOST = "https?://([A-Za-z0-9.-]+)"

  def urls(text: Column): Column = regexp_extract_all(text, lit(URL), lit(0))

  /** Sorted distinct hosts mentioned in `text`. */
  def domains(text: Column): Column =
    array_sort(array_distinct(transform(urls(text),
      u => regexp_extract(u, HOST, 1))))

  def hasBlocked(domainsCol: Column, blocklist: Seq[String]): Column =
    size(array_intersect(domainsCol, array(blocklist.map(lit): _*))) > 0
}
