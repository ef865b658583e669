package graft

import org.apache.spark.sql.functions._

import graft.sources.{CsvSource, Fixtures}

/** The CSV ingestion contract (q170): RFC-4180 round-trip fidelity and the
  * reject-quarantine split — the properties the DuckDB hash gate exercises
  * only indirectly (it never sees the quarantined lines). */
class CsvSourceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("tolerant scan quarantines exactly the garbage lines, with their raw text") {
    val dir = Fixtures.ensureOrdersCsv(spark, sf)
    val scanned = CsvSource.tolerant(spark, dir, Fixtures.ordersCsvSchema)
      // JsonSource.autoTolerant's planning restriction: materialize before
      // splitting on the corrupt column alone
      .cache()
    try {
      val rejects = scanned.filter(col("_corrupt_record").isNotNull)
        .select(col("_corrupt_record")).collect().map(_.getString(0)).sorted
      rejects shouldBe Fixtures.ordersCsvCorrupt.sorted.toArray
      // the clean split carries every orders row and no reject
      val clean = scanned.filter(col("_corrupt_record").isNull)
      clean.count() shouldBe Tables.orders(spark, sf).count()
      // wrong-arity and uncastable lines never leak typed values
      clean.filter(col("order_id") >= 13000001L).count() shouldBe 0
    } finally scanned.unpersist()
  }

  test("reject semantics are projection-independent: a pruned projection quarantines the same lines as the full one") {
    // the column-pruning footgun CsvSource.tolerant closes: damage in an
    // UNREFERENCED column (the garbage order_id line) must still flag the
    // row when a query reads only (cust_id, priority, total)
    val dir = Fixtures.ensureOrdersCsv(spark, sf)
    val all = Fixtures.ordersCsvSchema.fieldNames.map(col).toSeq
    val full = CsvSource.tolerant(spark, dir, Fixtures.ordersCsvSchema)
      .filter(col("_corrupt_record").isNull).select(all: _*)
      .collect().length
    // the pruned projection deliberately EXCLUDES order_id — the column
    // carrying the non-numeric garbage
    val pruned = CsvSource.tolerant(spark, dir, Fixtures.ordersCsvSchema)
      .filter(col("_corrupt_record").isNull)
      .select(col("cust_id"), col("priority"), col("total"))
      .collect().length
    pruned shouldBe full
  }

  test("quoting round-trip: embedded commas and doubled quotes survive; empty strings read as NULL") {
    val dir = Fixtures.ensureOrdersCsv(spark, sf)
    // cache() forces the full-row parse: under CSV column pruning a
    // narrow count(cust_id) query would miss rejects whose damage lives
    // in unreferenced columns (see CsvSource.tolerant scaladoc)
    val scanned = CsvSource.tolerant(spark, dir, Fixtures.ordersCsvSchema).cache()
    val clean = scanned.filter(col("_corrupt_record").isNull)
    // comment was written as: prio "<priority>", key <id>, status <status>
    val r = clean.filter(col("order_id") === 1L)
      .select(col("comment"), col("priority"), col("status"))
      .collect().head
    r.getString(0) shouldBe
      s"""prio "${r.getString(1)}", key 1, status ${r.getString(2)}"""
    // the ~1/23 anonymized orders (plus any source-NULL custkeys)
    // round-trip as real NULLs, not ""
    try clean.filter(col("cust_id").isNull).count() shouldBe
      Tables.orders(spark, sf)
        .filter(pmod(col("o_orderkey"), lit(23)) === 0 || col("o_custkey").isNull)
        .count()
    finally scanned.unpersist()
  }
}
