package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

import graft.operators.Scale

/** A/B evidence for q239's stats-driven broadcast decision (round-13
  * verdict #2): the same aggregate join, same scoped
  * `autoBroadcastJoinThreshold` (half the analyzed dim's catalog
  * totalSize), run with CBO off and on. Records per arm:
  *  - the STATIC join operator (`sparkPlan`, pre-AQE — the decision made
  *    from statistics at planning time);
  *  - total shuffle-write RECORDS across the run's tasks (SparkListener) —
  *    the honest scale metric: a static BroadcastHashJoin means the fact
  *    side never writes a map output, while the CBO-off SortMergeJoin pays
  *    the full fact exchange before AQE can rescue the join shape;
  *  - min-of-N wall seconds (local[32] underweights the saved exchange —
  *    the records column is the cluster-relevant number, and is stated
  *    as such in the artifact).
  *
  * Usage: `runMain graft.CboEvidence [sfDir] [outFile]`
  * (defaults: /root/testdata/sf0.1, work/ab_q239_cbo.json).
  *
  * The same run also A/Bs q242's stats-driven JOIN REORDER into
  * `work/ab_q242_reorder.json`. The reorder metric is different in kind
  * from q239's: the decision is LOGICAL (which pair joins first), so the
  * honest scale number is total JOIN-OPERATOR OUTPUT ROWS — the volume of
  * intermediate tuples the plan manufactures. With the written (bad)
  * order the fact joins the full customer dim first and the intermediate
  * is |orders|; with the DP reorderer consulting the ANALYZE stats,
  * customer joins the 1-row-filtered nation first and the intermediate
  * collapses to |customer|/ndv(n_name). Wall-clock barely moves at sf0.1
  * local[32] (both arms broadcast), which the artifact says out loud —
  * rows manufactured is the column that survives the 1000× scale-up.
  *
  * Third block: q243's runtime bloom-filter A/B into
  * `work/ab_q243_bloom.json` — same shuffle-write-records listener as
  * q239, because the injected `might_contain` predicate's whole point is
  * killing fact rows BEFORE the join exchange.
  */
object CboEvidence {

  /** Every physical node under `p`, descending through AQE wrappers and
    * materialized query stages (their `children` are empty — the real
    * subtree hangs off `plan`). */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allNodes(q.plan)
    case _ => p +: p.children.flatMap(allNodes)
  }

  /** Sum of `numOutputRows` across all join operators in the EXECUTED
    * plan — the intermediate-tuple volume the chosen join order paid. */
  private[graft] def joinOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect() // populates the plan's metrics (result is a tiny group-by)
    allNodes(df.queryExecution.executedPlan)
      .filter(_.nodeName.contains("Join"))
      .flatMap(_.metrics.get("numOutputRows").map(_.value))
      .sum
  }

  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outFile = if (args.length > 1) args(1) else "work/ab_q239_cbo.json"
    val iters = sys.env.getOrElse("SPARK_GRAFT_AB_ITERS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // dim build + ANALYZE once, OUTSIDE both measured arms
    val dim = ScaleQueries.q239DimTable(spark, sf)
    val thr = Scale.tableSizeInBytes(spark, dim) / 2

    val shuffleRecords = new AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shuffleRecords.addAndGet(t.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    spark.sparkContext.addSparkListener(listener)

    def arm(cbo: Boolean): (String, Long, Double) =
      ScaleQueries.withCboConf(spark, cbo, thr) {
        val staticPlan = ScaleQueries.q239Agg(spark, sf, dim)
          .queryExecution.sparkPlan.toString
        val joinNode =
          if (staticPlan.contains("BroadcastHashJoin")) "BroadcastHashJoin"
          else if (staticPlan.contains("SortMergeJoin")) "SortMergeJoin"
          else "other"
        var best = Double.MaxValue
        var recs = 0L
        for (_ <- 1 to iters) {
          Thread.sleep(500) // listener bus drain before the reset
          shuffleRecords.set(0)
          val t0 = System.nanoTime()
          ScaleQueries.q239Agg(spark, sf, dim)
            .write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          Thread.sleep(500) // and after, so the counter has settled
          if (sec < best) best = sec
          recs = math.max(recs, shuffleRecords.get) // stable across iters
        }
        (joinNode, recs, best)
      }

    val (jOff, rOff, sOff) = arm(cbo = false)
    val (jOn, rOn, sOn) = arm(cbo = true)
    spark.sparkContext.removeSparkListener(listener)

    val json =
      s"""{"probe":"graft.CboEvidence — q239 aggregate join at $sf, local[$cpus], threshold=${thr}B (half the analyzed dim's totalSize), min of $iters",
         |"cbo_off":{"static_join":"$jOff","shuffle_write_records":$rOff,"sec":${f"$sOff%.3f"}},
         |"cbo_on":{"static_join":"$jOn","shuffle_write_records":$rOn,"sec":${f"$sOn%.3f"}},
         |"note":"shuffle-write records is the cluster-relevant column: the static BroadcastHashJoin never writes the fact side's map output, while the CBO-off SortMergeJoin pays the full orders exchange before AQE can re-plan; local[32] wall-clock underweights that saved exchange"}""".stripMargin
    Evidence.writeArtifact(outFile, json)

    // ---- q242: the reorder A/B (same session, same ANALYZE'd catalog) ----
    val reorderOut = if (args.length > 2) args(2) else "work/ab_q242_reorder.json"
    val tables = ScaleQueries.q242Tables(spark, sf)
    def reorderArm(on: Boolean): (String, Long, Double) =
      ScaleQueries.withReorderConf(spark, on) {
        val df = ScaleQueries.q242Join(spark, tables)
        var best = Double.MaxValue
        var rows = 0L
        for (_ <- 1 to iters) {
          val fresh = ScaleQueries.q242Join(spark, tables)
          val t0 = System.nanoTime()
          rows = joinOutputRows(fresh)
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        val leafJoin = df.queryExecution.optimizedPlan.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join
              if j.collect {
                case jj: org.apache.spark.sql.catalyst.plans.logical.Join => jj
              }.size == 1 =>
            j.collect {
              case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
                r.catalogTable.map(_.identifier.table).getOrElse("?")
            }.sorted.mkString("⋈")
        }.headOption.getOrElse("?")
        (leafJoin, rows, best)
      }
    val (loOff, jrOff, tOff) = reorderArm(on = false)
    val (loOn, jrOn, tOn) = reorderArm(on = true)
    val reorderJson =
      s"""{"probe":"graft.CboEvidence — q242 3-table join at $sf, local[$cpus], min of $iters; metric = Σ numOutputRows over all join operators in the executed plan (intermediate tuples manufactured by the chosen join order)",
         |"reorder_off":{"first_join":"$loOff","join_output_rows":$jrOff,"sec":${f"$tOff%.3f"}},
         |"reorder_on":{"first_join":"$loOn","join_output_rows":$jrOn,"sec":${f"$tOn%.3f"}},
         |"note":"the decision is logical, so rows manufactured is the scale-honest column: the written order pays an |orders|-sized intermediate before the 1-row nation filter lands, the stats-fed DP reorderer pays |customer|/ndv(n_name); wall-clock at sf0.1 local[32] barely moves because both arms broadcast the small sides — at 100 TB the intermediate is the difference between shuffling the fact and shuffling a sliver"}""".stripMargin
    Evidence.writeArtifact(reorderOut, reorderJson)

    // ---- q243: the runtime bloom filter A/B (same listener) ----
    val bloomOut = if (args.length > 3) args(3) else "work/ab_q243_bloom.json"
    def bloomArm(on: Boolean): (Long, Double) =
      ScaleQueries.withRuntimeFilterConf(spark, on) {
        var best = Double.MaxValue
        var recs = 0L
        for (_ <- 1 to iters) {
          Thread.sleep(500)
          shuffleRecords.set(0)
          val t0 = System.nanoTime()
          ScaleQueries.q243Join(spark, sf)
            .write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          Thread.sleep(500)
          best = math.min(best, sec)
          recs = math.max(recs, shuffleRecords.get)
        }
        (recs, best)
      }
    spark.sparkContext.addSparkListener(listener)
    val (bOff, btOff) = bloomArm(on = false)
    val (bOn, btOn) = bloomArm(on = true)
    spark.sparkContext.removeSparkListener(listener)
    val bloomJson =
      s"""{"probe":"graft.CboEvidence — q243 selective dim join at $sf, local[$cpus], min of $iters; broadcast disabled in BOTH arms (the shuffle-join regime is the 100 TB shape); metric = total shuffle-write records",
         |"bloom_off":{"shuffle_write_records":$bOff,"sec":${f"$btOff%.3f"}},
         |"bloom_on":{"shuffle_write_records":$bOn,"sec":${f"$btOn%.3f"}},
         |"note":"with InjectRuntimeFilter on, the might_contain predicate kills the non-matching ~24/25 of lineitem AT THE SCAN, so the fact's map output shrinks to the matching sliver (plus bloom false positives and the tiny bloom_filter_agg subquery's own exchange); off, the full fact projection rides the join exchange"}""".stripMargin
    Evidence.writeArtifact(bloomOut, bloomJson)

    spark.stop()
    val ok = jOff == "SortMergeJoin" && jOn == "BroadcastHashJoin" && rOn < rOff
    val okReorder = loOn != loOff && jrOn < jrOff
    val okBloom = bOn < bOff / 5 // at least 5x shuffle-volume reduction
    if (!ok || !okReorder || !okBloom) sys.exit(1)
  }

}
