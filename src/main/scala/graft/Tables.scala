package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * At cluster scale these would be `spark.read.parquet("s3a://bucket/table/")`
  * over partitioned directories; the API is path-based so the same code runs
  * on a 1000-executor cluster. Filters/projections applied by callers are
  * pushed into the parquet scan by Catalyst (PushedFilters / ReadSchema).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `documents`, hash-distributed on doc_id before CPU-dense per-doc work
    * (fingerprints, shingling, minhash). Scans are only as parallel as the
    * input's row groups; a fingerprint stage is compute-bound, not
    * scan-bound, so rebalancing a few bytes per doc across all cores before
    * hashing is the standard cluster move (the shuffle moves the raw text
    * once — far cheaper than serializing the hash work on a few tasks). */
  def documentsDistributed(s: SparkSession, d: String): DataFrame =
    documents(s, d).repartition(org.apache.spark.sql.functions.col("doc_id"))

  /** `events.parquet` carries TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects; read the raw int64 nanos (legacy conf, set once at session
    * construction in [[GraftSession]]) and surface `ts` as a proper
    * microsecond TimestampType column via floor division — see
    * [[Epoch.floorDiv]]. DuckDB's CAST(ts_ns AS TIMESTAMP) also floors.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    ensureNanosConf(spark)
    load(spark, dir, "events")
      .withColumn("ts", timestamp_micros(Epoch.floorDiv(col("ts"), 1000L)))
  }

  /** Raw variant keeping `ts` as int64 nanoseconds. */
  def eventsRawNanos(spark: SparkSession, dir: String): DataFrame = {
    ensureNanosConf(spark)
    load(spark, dir, "events")
  }

  /** [[GraftSession]] sets `nanosAsLong` at build time for all our mains and
    * tests; the driver, however, calls `SparkEntry.entry` with its OWN
    * session, so events loads keep this idempotent fallback (always the same
    * value — never toggled — so concurrent query building cannot race it). */
  private def ensureNanosConf(spark: SparkSession): Unit =
    if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").forall(_ != "true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
}
