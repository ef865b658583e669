package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B evidence for the native AS-OF JOIN (q256): the SAME point-in-time
  * lookup, run through the composable union+window formulation (q50's —
  * both event subsets through ONE exchange, each row null-padded to the
  * union schema, a window walk over the merged run) and through
  * [[graft.plans.AsofJoinExec]] (each side its own narrow exchange, one
  * forward merge pass). Per arm:
  *  - total shuffle-write records AND bytes (SparkListener) — the
  *    scale-honest columns: the union arm shuffles |purchases|+|clicks|
  *    wide null-padded rows; the native arm shuffles each side at its
  *    own width, the click side post-partial-aggregation;
  *  - min-of-N wall seconds.
  * Both arms' results are checksum-compared (order-independent xor of
  * xxhash64 over every output column) before anything is written — the
  * operator being measured must be invisible in the answer.
  *
  * Usage: `runMain graft.AsofEvidence [sfDir] [outFile]`
  * (defaults: /root/testdata/sf0.1, work/ab_asof_native.json).
  */
object AsofEvidence {

  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outFile = if (args.length > 1) args(1) else "work/ab_asof_native.json"
    val iters = sys.env.getOrElse("SPARK_GRAFT_AB_ITERS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleRecords = new AtomicLong(0)
    val shuffleBytes = new AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          shuffleRecords.addAndGet(t.taskMetrics.shuffleWriteMetrics.recordsWritten)
          shuffleBytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
    }
    spark.sparkContext.addSparkListener(listener)

    def checksum(df: DataFrame): Long = {
      val r = df.select(df.columns.toIndexedSeq.map(col): _*)
        .agg(expr("bit_xor(xxhash64(" + df.columns.mkString(", ") + "))"))
        .head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }

    // The committed (sec, records, bytes) triple comes from ONE iteration
    // — the fastest — so the artifact's columns describe the same run;
    // counters drain for a full second before reading (listener delivery
    // is async, and undercounted shuffle columns would poison the
    // scale-honest numbers without any gate noticing).
    def measure(mk: () => DataFrame): (Double, Long, Long) = {
      var best = (Double.MaxValue, 0L, 0L)
      // drain the bus BEFORE the first reset too: the checksum/count
      // queries that ran just before measure() still have task-end
      // events in flight, and they must not inflate iteration 1
      Thread.sleep(1000)
      for (_ <- 1 to iters) {
        shuffleRecords.set(0); shuffleBytes.set(0)
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1000) // listener bus drain, before the counter reads
        if (sec < best._1) best = (sec, shuffleRecords.get, shuffleBytes.get)
      }
      best
    }

    val window = () => WindowQueries.asofClicks(Tables.events(spark, sf))
    val native = () => WindowQueries.asofNative(Tables.events(spark, sf),
      strict = true)

    val csW = checksum(window())
    val csN = checksum(native())
    require(csW == csN,
      s"arms disagree: window=$csW native=$csN — refusing to write evidence")
    val nRows = native().count()

    val (wSec, wRecs, wBytes) = measure(window)
    val (nSec, nRecs, nBytes) = measure(native)

    val json =
      s"""{"probe": "graft.AsofEvidence — q50 union+window formulation vs q256 native AsofJoinExec, same point-in-time answer (checksum-verified equal: $csN), local[$cpus], min-of-$iters",
         | "sf": "$sf",
         | "rows_out": $nRows,
         | "window_arm": {"sec": ${f"$wSec%.3f"}, "shuffle_records": $wRecs, "shuffle_bytes": $wBytes},
         | "native_arm": {"sec": ${f"$nSec%.3f"}, "shuffle_records": $nRecs, "shuffle_bytes": $nBytes},
         | "note": "the union arm shuffles purchases+clicks as ONE null-padded stream and window-walks the merged run; the native arm gives each side its own narrow exchange (clicks post-partial-agg) and merges with a single buffered row. Shuffle records/bytes are the columns that survive a 1000x scale-up."}""".stripMargin
    Evidence.writeArtifact(outFile, json)
    spark.stop()
  }
}
