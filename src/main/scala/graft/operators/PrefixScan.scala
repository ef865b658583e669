package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix aggregation (a running scan along a GLOBAL order)
  * without the global sort-to-one-partition that `Window.orderBy` with no
  * partition key degenerates to.
  *
  * A running total / running maximum over an entire table is the classic
  * "looks sequential" operator: the naive plan (one unpartitioned window)
  * funnels 100 TB through a single task. The two-stage scan is the
  * textbook parallel fix (Blelloch's scan, the same shape every GPU/MPI
  * prefix sum uses):
  *
  *   stage 1 — bucket rows by a COARSE key that is non-decreasing along
  *     the intended order (the day of the timestamp, the id block) and run
  *     the scan within each (group, bucket) partition — a normal
  *     partitioned window, fully parallel;
  *   stage 2 — aggregate one total per bucket (collapses map-side to
  *     |buckets| rows), scan THOSE with a window per group — |buckets| is
  *     metadata-sized (days in a year, id blocks in a table), so the
  *     single-partition frame holds thousands of rows, never the data —
  *     and broadcast-join each bucket's exclusive offset back.
  *
  * running(row) = offset(bucket) ⊕ local_scan(row). Exact for any
  * associative ⊕; exposed here for the two BIGINT monoids the catalog
  * needs (sum, max), which also makes every result deterministic under
  * any partitioning or task order.
  *
  * Caller contract: `bucket` must be non-decreasing along the global order
  * (bucket boundaries are order boundaries), and (bucket, order*) must
  * totally order rows within a group — ties would make per-row running
  * values ill-defined in ANY engine, including the DuckDB oracle.
  */
object PrefixScan {

  /** Adds `out`: the running aggregate of `value` along
    * (bucket, order*) within each `group` (inclusive of the current row,
    * or strictly-preceding when `exclusive`; the exclusive scan of the
    * globally-first row is 0 for sum, NULL for max).
    * `op` is "sum" or "max" over a LongType `value`. */
  def running(df: DataFrame, group: Seq[String], bucket: Column,
              order: Seq[Column], value: Column, op: String,
              out: String, exclusive: Boolean): DataFrame = {
    require(op == "sum" || op == "max", s"unsupported scan op: $op")
    def agg(c: Column): Column = if (op == "sum") sum(c) else max(c)

    val gCols = group.map(col)
    val d = df.withColumn("_psb", bucket).withColumn("_psv", value)

    val wLocal = Window.partitionBy(gCols :+ col("_psb"): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, if (exclusive) -1 else 0)
    val local = d.withColumn("_psl", agg(col("_psv")).over(wLocal))

    // One total per (group, bucket): partial-aggregates map-side to
    // |buckets| rows before any exchange. The offset scan below runs over
    // those rows only — the single-partition-per-group frame is the
    // BUCKET SUMMARY, never the data.
    val wOff = Window.partitionBy(gCols: _*).orderBy(col("_psb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = d.groupBy(gCols :+ col("_psb"): _*).agg(agg(col("_psv")).as("_pst"))
      .withColumn("_pso", agg(col("_pst")).over(wOff))
      .select(gCols :+ col("_psb") :+ col("_pso"): _*)

    val joined = local.join(broadcast(offsets), group :+ "_psb")
    val running =
      if (op == "sum") coalesce(col("_pso"), lit(0L)) + coalesce(col("_psl"), lit(0L))
      else greatest(col("_pso"), col("_psl")) // greatest skips NULLs; NULL iff both
    joined.withColumn(out, running).drop("_psb", "_psv", "_psl", "_pso")
  }
}
