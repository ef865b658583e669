package graft

/** Benchmark main (driver contract). Runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * The action is a `noop`-format write, not `count()`: count() lets Catalyst
  * prune every computed column (and serve parquet counts from footer
  * metadata), so projection-heavy queries would appear free. The noop sink
  * consumes every row and every column — the full physical plan runs.
  * Each query is timed over SPARK_GRAFT_BENCH_ITERS (default 5) iterations
  * and the per-query MINIMUM is reported (plus the iteration count and the
  * relative spread (max-min)/min), so a noisy host window can't fake a
  * regression — and when it tries, the spread says so: a genuine plan
  * regression shows a moved minimum with a small spread; a host burst shows
  * a large spread around an unmoved minimum (the round-7 q28 "6×" was the
  * latter). Failures on ANY iteration flip the exit code; a broken query
  * must never look "fast".
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // wall-clock bracket for drift adjudication: EVERY round sees midday
    // host contention; start/end stamps make the affected window legible
    // without git archaeology (round-16 verdict ask #8)
    val wallStart = System.currentTimeMillis
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Steady-state methodology: run the entire catalog once at the smallest
    // scale (untimed) so whole-stage-codegen compilation and JIT happen
    // outside the timed pass — the generated-code cache keys on plan
    // structure, which is scale-independent, so the timed run at the target
    // scale measures the plans, not first compilation.
    spark.range(1000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()
    val warmSf = sys.env.getOrElse("SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.001")
    // Builder-side iteration aid: comma-separated query names to time a
    // subset (the driver never sets this — its run stays full-catalog).
    // Resolved BEFORE the warmup so a subset run warms only what it times.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    if (!new java.io.File(warmSf).isDirectory)
      System.err.println(s"[bench] WARN warmup dir $warmSf missing — timed numbers include first-compilation cost")
    else SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, warmSf).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        // non-fatal (the timed pass decides pass/fail), but never silent
        System.err.println(s"[bench] WARN warmup $name failed: ${e.getMessage}")
      }
    }
    // If the warmup scale IS the timed scale, the warmup left warm state
    // behind (Etl memo, bucketed tables) — timed q13/q29 would measure
    // cache hits. Purge so they measure the real build.
    if (new java.io.File(warmSf).getCanonicalPath == new java.io.File(sfDir).getCanonicalPath) {
      System.err.println(s"[bench] WARN warmup dir == timed dir; purging warm Etl/bucket state")
      graft.pipeline.Etl.invalidate(sfDir)
      ScaleQueries.purgeWriteOnceLayouts(spark, sfDir)
    }
    // Self-defending measurement: each query runs `iters` timed iterations
    // and reports the per-query MINIMUM. A one-shot number can't tell a
    // code regression from a noisy host window (a 2× phantom regression is
    // exactly one unlucky scheduling burst); the min of 3 back-to-back runs
    // is the cost floor of the plan itself — what a second run on a quiet
    // host would reproduce.
    val iters = sys.env.get("SPARK_GRAFT_BENCH_ITERS")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption.orElse {
        System.err.println(s"[bench] WARN unparsable SPARK_GRAFT_BENCH_ITERS '$v', using 5")
        None
      }).getOrElse(5).max(1)
    // Stateful queries must pay their own build in EVERY timed iteration,
    // or the minimum is just the warm replay and a build regression is
    // invisible: q13's Etl memo is dropped (cold star rebuild contract);
    // q54's persisted scored projection is uncached (corpus pass + cache
    // build is the operator's cost); each write-once layout query gets its
    // OWN layouts purged (ScaleQueries.layoutsByQuery). The same reset runs
    // once more AFTER a query's iterations, so no stray cache/layout state
    // leaks into the queries timed after it.
    val perIterReset: Map[String, () => Unit] = Map(
      "q13_star_pipeline_counts" -> (() => graft.pipeline.Etl.invalidate(sfDir)),
      "q54_quality_cutoff" -> (() => spark.catalog.clearCache())) ++
      ScaleQueries.layoutsByQuery.map { case (q, tables) =>
        q -> (() => ScaleQueries.purgeLayouts(spark, sfDir, tables))
      }
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      var times = List.empty[Double]
      var broken = false
      var i = 0
      while (i < iters && !broken) { // a failed query is condemned: stop early
        perIterReset.get(name).foreach(_.apply())
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              times ::= (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          broken = true
        }
        i += 1
      }
      perIterReset.get(name).foreach(_.apply())
      // Between-queries hygiene (untimed): queries that persist or
      // localCheckpoint release their own state on the happy path, but
      // ContextCleaner only reclaims checkpoint/cache blocks when the
      // driver GCs the RDD handle — in a 230-query single-JVM session the
      // strays accumulate as storage pressure. Every prior query's
      // DataFrames are dead here, so dropping all persistent RDDs and
      // cached plans is safe and makes each query's timing independent of
      // catalog position. (When comparing runs, compare like CPU counts
      // too: SPARK_GRAFT_CPUS defaults to 4, and a CPU-bound query like
      // q84 reads 4.9 s at local[4] vs 2.0 s at local[32] — that delta is
      // thread count, not a regression.)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      // Any failed iteration fails the query: a plan that only sometimes
      // executes must never look "fast".
      val ok = !broken && times.size == iters
      if (!ok) failed ::= name
      // Relative spread (max-min)/min over the iterations: the
      // noise-vs-regression discriminator (see the object scaladoc).
      val spread = if (ok && times.min > 0) (times.max - times.min) / times.min else -1.0
      (name, if (ok) times.min else -1.0, spread, ok)
    }
    val qs = results
      .map { case (k, v, _, _) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    val spreads = results
      .map { case (k, _, sp, _) => s""""$k":${"%.2f".formatLocal(java.util.Locale.ROOT, sp)}""" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, _, true) => v }.sum
    // Noise self-description for the TAIL capture: the per-query spread map
    // rides at the front of the line (cheapest to lose), but the driver's
    // BENCH_r{N}.json keeps only the END — so the aggregate discriminators
    // (median/max relative spread over the catalog) go next to the headline
    // fields. A run whose spread_med is ~0.1 and spread_max ~1 is a normal
    // host window; round-over-round deltas inside that envelope are noise,
    // not regressions (the round-11 A/B artifact quantified this).
    val okSpreads = results.collect { case (_, _, sp, true) if sp >= 0 => sp }.sorted
    // true median: even-sized catalogs average the two middles (the upper
    // middle alone would overstate the noise envelope this field defines)
    val spreadMed =
      if (okSpreads.isEmpty) -1.0
      else if (okSpreads.size % 2 == 1) okSpreads(okSpreads.size / 2)
      else (okSpreads(okSpreads.size / 2 - 1) + okSpreads(okSpreads.size / 2)) / 2.0
    val spreadMax = if (okSpreads.isEmpty) -1.0 else okSpreads.last
    def f2(x: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, x)
    // Field order matters: the driver's tail capture keeps the END of the
    // line, so the headline fields (value/failed) go LAST and the spread
    // diagnostics go FIRST — they are the cheapest thing to lose to a
    // truncation.
    val wallEnd = System.currentTimeMillis
    val wallIso = {
      val fmt = java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME
      def iso(ms: Long) = java.time.Instant.ofEpochMilli(ms)
        .atZone(java.time.ZoneId.systemDefault()).format(fmt)
      s""""wall_start":"${iso(wallStart)}","wall_end":"${iso(wallEnd)}","wall_sec":${(wallEnd - wallStart) / 1000}"""
    }
    val line = s"""{"metric":"total","unit":"sec","sf":"$sfDir","iters":$iters,$wallIso,"spread":$spreads,"queries":$qs,"spread_med":${f2(spreadMed)},"spread_max":${f2(spreadMax)},"failed":${failed.size},"value":$total}"""
    // Durable artifact: the driver's stdout capture keeps only the TAIL of
    // this (very long) line, losing most per-query times to round-over-round
    // comparison. Write the complete line to a file as well so the full
    // 230-query profile survives (round-9 advice #4). Best-effort: a bench
    // must never fail because the artifact directory is read-only. The
    // notice goes to stdout BEFORE the JSON line: sbt tags stderr `[error]`
    // (which read as a failure in BENCH_r11's tail), and the JSON line must
    // stay the last stdout line for any last-line parser.
    try {
      // cwd-relative default (the session already pins warehouse paths
      // relative to the repo); SPARK_GRAFT_BENCH_OUT overrides
      val out = new java.io.File(sys.env.getOrElse(
        "SPARK_GRAFT_BENCH_OUT", "work/bench_last.json"))
      Option(out.getParentFile).foreach(_.mkdirs())
      val w = new java.io.PrintWriter(out, "UTF-8")
      try w.println(line) finally w.close()
      println(s"[bench] full JSON written to ${out.getPath}")
    } catch { case e: Throwable =>
      // stdout BEFORE the JSON line, for the same reason as the success
      // notice: sbt tags stderr `[error]`, and a benign artifact-write
      // failure must not masquerade as a run error in a tail capture.
      println(s"[bench] WARN could not write artifact file: ${e.getMessage}")
      System.err.println(s"[bench] WARN could not write artifact file: ${e.getMessage}")
    }
    println(line)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
