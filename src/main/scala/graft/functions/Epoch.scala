package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Epoch-time arithmetic helpers (reference: COPY … timeformat as
  * 'epochmillisecs', sql_queries.py:121-124).
  *
  * Floor division, not truncation: Spark's `div` truncates toward zero,
  * while DuckDB's epoch casts floor toward negative infinity — they differ
  * for pre-1970 instants. `(c - pmod(c, m)) div m` is exact floor division
  * in pure integer arithmetic (pmod is always non-negative, the adjusted
  * numerator is exactly divisible). Stays in LongType throughout: epoch
  * nanos ≈ 1.5e18 exceed double's 2^53 mantissa, so a double `/` would
  * silently lose precision.
  */
object Epoch {

  /** Integer floor division `c floordiv m` for LongType columns. */
  def floorDiv(c: Column, m: Long): Column =
    call_function("div", c - pmod(c, lit(m)), lit(m))

  /** Epoch nanoseconds → epoch milliseconds (floor). */
  def nanosToMillis(c: Column): Column = floorDiv(c, 1000000L)

  /** Epoch milliseconds (integral) → TimestampType. */
  def millisToTimestamp(c: Column): Column = timestamp_millis(c)

  /** Float epoch-milliseconds (e.g. the reference's `registration` field,
    * README.md:39-42 `1541033612796.0`) → TimestampType, flooring the
    * fractional millisecond. Values ≈ 1.5e12 are exactly representable in
    * double, so floor() here is exact. */
  def floatMillisToTimestamp(c: Column): Column =
    timestamp_millis(floor(c).cast("long"))
}
