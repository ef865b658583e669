package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** A/B evidence for the materialized-view rewrite family (q245–q247 scan
  * MVs, q249 join-aggregate MV): the SAME user-shaped reporting queries,
  * run unregistered (raw scans / raw star join) and registered (served
  * from the summaries). Per arm and per query:
  *  - rows entering the plan from file scans (`Metrics.scannedRows`) —
  *    the scale-honest column: served, a reporting query reads |summary|
  *    rows; raw, it re-reads the corpus (and for q249 BOTH star legs);
  *  - total shuffle-write records (SparkListener) — q249's served form
  *    has no join exchange at all;
  *  - min-of-N wall seconds (at sf0.1 both are fast; the rows column is
  *    what survives the 1000× scale-up, and the artifact says so).
  * The results of each pair are checksum-compared before anything is
  * written — the rewrite being measured must be invisible.
  *
  * Usage: `runMain graft.MvEvidence [sfDir] [outFile]`
  * (defaults: /root/testdata/sf0.1, work/ab_mv_rewrite.json).
  */
object MvEvidence {

  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outFile = if (args.length > 1) args(1) else "work/ab_mv_rewrite.json"
    val iters = sys.env.getOrElse("SPARK_GRAFT_AB_ITERS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // MV builds happen once, OUTSIDE both measured arms
    val scanMv = ScaleQueries.q245MvDef(spark, sf)
    val joinMv = ScaleQueries.q249MvDef(spark, sf)

    val shuffleRecords = new AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shuffleRecords.addAndGet(t.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    spark.sparkContext.addSparkListener(listener)

    val queries: Seq[(String, () => org.apache.spark.sql.DataFrame,
        graft.plans.MvCatalog.MvDef)] = Seq(
      ("q245_mv_rewrite", () => ScaleQueries.q245Direct(spark, sf), scanMv),
      ("q246_mv_navigate", () => ScaleQueries.q246Direct(spark, sf), scanMv),
      ("q247_mv_filtered", () => ScaleQueries.q247Direct(spark, sf), scanMv),
      ("q249_mv_join_agg", () => ScaleQueries.q249Direct(spark, sf), joinMv))

    def measure(q: () => org.apache.spark.sql.DataFrame)
        : (Long, Long, Double, Long) = {
      var scanRows = 0L
      var recs = 0L
      var best = Double.MaxValue
      for (_ <- 1 to iters) {
        Thread.sleep(500)
        shuffleRecords.set(0)
        val df = q()
        val t0 = System.nanoTime()
        scanRows = Metrics.scannedRows(df).map(_._2).sum
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        Thread.sleep(500)
        recs = math.max(recs, shuffleRecords.get)
      }
      // checksum once per arm, outside the timed iterations — it is the
      // same rows every time and must not double the measured executions
      val checksum = q().collect().map(_.toString.hashCode.toLong).sorted
        .foldLeft(1125899906842597L)((h, x) => h * 31 + x)
      (scanRows, recs, best, checksum)
    }

    var allOk = true
    val rows = queries.map { case (name, q, mvd) =>
      val (rawScan, rawRecs, rawSec, rawSum) = measure(q)
      val (mvScan, mvRecs, mvSec, mvSum) =
        graft.plans.MvCatalog.withMv(spark, mvd) { measure(q) }
      val equal = rawSum == mvSum
      allOk &&= equal && mvScan < rawScan
      s"""{"query":"$name","results_equal":$equal,
         |"raw":{"scan_rows":$rawScan,"shuffle_write_records":$rawRecs,"sec":${f"$rawSec%.3f"}},
         |"served":{"scan_rows":$mvScan,"shuffle_write_records":$mvRecs,"sec":${f"$mvSec%.3f"}}}""".stripMargin
    }

    spark.sparkContext.removeSparkListener(listener)
    val json =
      s"""{"probe":"graft.MvEvidence — the same user-shaped reporting queries raw vs MV-served at $sf, local[$cpus], min of $iters; scan_rows = rows entering the plan from file scans",
         |"queries":[
         |${rows.mkString(",\n")}
         |],
         |"note":"scan_rows is the column that survives the 1000x scale-up: served, a reporting query reads |summary| rows (and q249's star join vanishes entirely — no join exchange, neither star leg scanned); raw, it re-reads the corpus every time. Results checksum-equal per pair — the rewrite is invisible to the answer, the oracle hash gate proves the same at sf0.01."}""".stripMargin
    Evidence.writeArtifact(outFile, json)
    spark.stop()
    if (!allOk) sys.exit(1)
  }
}
