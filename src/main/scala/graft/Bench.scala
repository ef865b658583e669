package graft

/** Benchmark main (driver contract). Runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * The action is a `noop`-format write, not `count()`: count() lets Catalyst
  * prune every computed column (and serve parquet counts from footer
  * metadata), so projection-heavy queries would appear free. The noop sink
  * consumes every row and every column — the full physical plan runs.
  * Failures are reported per-query (`ok:false`) and flip the exit code;
  * a broken query must never look "fast".
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/codegen/parquet-reader paths once so the first timed
    // query doesn't absorb session bootstrap cost (it applies equally to
    // every query, so excluding it keeps per-query numbers comparable).
    spark.range(1000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()
    Tables.lineitem(spark, sfDir).limit(10).write.format("noop").mode("overwrite").save()
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed ::= name
          false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results
      .map { case (k, v, ok) => s""""$k":${if (ok) v else -1.0}""" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","failed":${failed.size}}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
