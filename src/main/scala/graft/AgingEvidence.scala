package graft

/** Session-aging diagnosis (round-14 verdict #6): the full 276-query
  * bench ladder showed a settled-vs-cold spread (181 → 161 s) and "ANY
  * 12-query prefix inflates a probe", with no single query's plan to
  * blame. This harness measures WHERE the aging lives by A/B-ing the
  * main suspects in fresh JVMs:
  *
  *  - `default`: [[GraftSession.builder]] as the bench runs it;
  *  - `trimmed`: + status-store retention trimmed (jobs/stages/tasks/SQL
  *    executions). Even with the UI off, every execution feeds the
  *    driver's in-memory AppStatusStore — Spark retains up to 1000 jobs,
  *    1000 stages, 100k tasks and 1000 SQL executions WITH their plan
  *    graphs and metric maps, so a 276×5-execution session carries
  *    hundreds of MB of dead bookkeeping and a listener bus that touches
  *    it on every event.
  *
  * Each arm: probe (median of 7 runs of a fixed mid-size aggregate) →
  * FILLER (`fillers` distinct executions rotating over group-by moduli,
  * joins and windows — distinct plans, like the bench catalog) → probe
  * again → System.gc() → probe once more (separates retained-heap cost
  * from reference-tracked garbage the ContextCleaner only frees on GC).
  * Inflation = probe_after / probe_before per arm, JVM-for-JVM.
  *
  * Usage: `runMain graft.AgingEvidence <arm> [outFile] [fillers]`,
  * one fresh JVM per arm; tools combine the per-arm JSONs. */
object AgingEvidence {

  def main(args: Array[String]): Unit = {
    val arm = if (args.length > 0) args(0) else "default"
    val outFile = if (args.length > 1) args(1) else s"work/aging_$arm.json"
    val fillers = if (args.length > 2) args(2).toInt else 400
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    var b = GraftSession.builder("local[32]", 32)
    if (arm == "trimmed") b = b
      .config("spark.sql.ui.retainedExecutions", "30")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "2000")
      .config("spark.sql.ui.retainedExecutionsPerStatus", "30")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = s"parquet.`$sfDir/events.parquet`"
    def run(q: String): Unit = { spark.sql(q).collect(); () }

    // the probe: a fixed two-stage aggregate over events — mid-size, no
    // cached state, the same plan every time
    val probeSql =
      s"""SELECT event_id % 13 AS g, count(*) AS n,
         |  sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents
         |FROM $events WHERE value IS NOT NULL GROUP BY 1""".stripMargin
    def probe(reps: Int = 7): Double = {
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime(); run(probeSql)
        (System.nanoTime() - t0) / 1e6
      }.sorted
      times(reps / 2)
    }
    def heapMb: Long = {
      val r = Runtime.getRuntime
      (r.totalMemory() - r.freeMemory()) / (1024 * 1024)
    }

    def filler(i: Int): Unit = {
      val m = i % 97 + 2
      (i % 3) match {
        case 0 => run(s"SELECT event_id % $m AS g, count(*) AS n " +
          s"FROM $events GROUP BY 1")
        case 1 => run(s"SELECT a.event_id % $m AS g, count(*) AS n " +
          s"FROM $events a JOIN $events b ON a.event_id = b.event_id " +
          "GROUP BY 1")
        case _ => run("SELECT max(r) AS mr FROM (SELECT row_number() OVER " +
          s"(PARTITION BY event_id % $m ORDER BY value) AS r FROM $events)")
      }
    }

    // REAL warm-up first — JIT, codegen, shuffle services, IO caches all
    // settle before the baseline probe, else warm-up masquerades as
    // (negative) aging and the A/B measures nothing
    (0 until 60).foreach(i => filler(100000 + i))
    (0 until 10).foreach(_ => run(probeSql))
    val before = probe()
    val heapBefore = heapMb

    // filler: `fillers` DISTINCT executions (rotating literals force new
    // plans/codegen/listener entries, the catalog-bench shape)
    (0 until fillers).foreach(filler)

    val after = probe()
    val heapAfter = heapMb
    System.gc(); Thread.sleep(1000); System.gc()
    val postGc = probe()
    val heapPostGc = heapMb

    val json =
      s"""{"arm": "$arm", "fillers": $fillers, "sf": "$sfDir",
         | "probe_before_ms": ${"%.1f".format(before)},
         | "probe_after_ms": ${"%.1f".format(after)},
         | "probe_post_gc_ms": ${"%.1f".format(postGc)},
         | "inflation": ${"%.3f".format(after / before)},
         | "inflation_post_gc": ${"%.3f".format(postGc / before)},
         | "heap_mb_before": $heapBefore, "heap_mb_after": $heapAfter,
         | "heap_mb_post_gc": $heapPostGc}""".stripMargin
    Evidence.writeArtifact(outFile, json)
    spark.stop()
  }
}
