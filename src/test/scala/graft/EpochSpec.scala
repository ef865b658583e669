package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Epoch conversions (X6): floor semantics for pre-1970 instants and float
  * epoch-ms parsing (FIXTURES.md §1 — `registration` is a float ms value). */
class EpochSpec extends SparkSpec {
  import spark.implicits._

  test("floorDiv floors toward negative infinity (pre-1970 instants)") {
    val rows = Seq(-1999999999L, -1L, 0L, 1L, 1999999999L).toDF("ns")
      .select(Epoch.nanosToMillis(col("ns")).as("ms"))
      .as[Long].collect().toSeq
    // -1999999999 ns = -2.0 s + 1ns → floor(-1999.999999) = -2000 ms
    rows shouldBe Seq(-2000L, -1L, 0L, 0L, 1999L)
  }

  test("nanos -> timestamp matches millisecond flooring for negative values") {
    val ts = Seq(-1500L) // -1.5 us
      .toDF("ns")
      .select(timestamp_micros(Epoch.floorDiv(col("ns"), 1000L)).as("t"))
      .as[Timestamp].head()
    ts.getTime shouldBe -1L // floors to -2 us = -0.002 ms → Timestamp.getTime rounds to ms: -1
  }

  test("float epoch-ms floors the fractional millisecond (registration field)") {
    val t = Seq(1541033612796.5, 1541033612796.0)
      .toDF("ms")
      .select(Epoch.floatMillisToTimestamp(col("ms")).as("t"))
      .as[Timestamp].collect().toSeq
    t.map(_.getTime) shouldBe Seq(1541033612796L, 1541033612796L)
  }
}
