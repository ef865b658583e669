package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Executed-plan metrics audit — the quantitative half of the PlanSpec
  * discipline. PlanSpec pins plan SHAPES (broadcast not sort-merge, one
  * exchange not two); this reads the SQL metrics off the plan that actually
  * ran, so a spec can pin plan VOLUMES: "the LSH exchange carries
  * O(docs·bands) rows, not O(docs²)", "the sketch aggregation ships
  * partials, not data". Shuffle RECORD counts are deterministic for a fixed
  * input and plan (unlike bytes, which track codec/layout details), so they
  * gate exactly like row counts — a regression that silently turns a
  * partial aggregation into a full-row exchange moves these counts by
  * orders of magnitude and fails the budget long before anyone re-benches
  * at scale.
  *
  * Usage: run an action on the DataFrame, then read the totals off the SAME
  * Dataset instance (metrics live on its queryExecution); or call
  * [[shuffledRecords]] which does both.
  */
object Metrics {

  /** Total records written across every shuffle exchange in `df`'s executed
    * plan (AQE stages unwrapped, reused exchanges counted once), after
    * running a full-plan action on it. The action drives THIS Dataset's own
    * queryExecution (a `DataFrameWriter` or `count()` would plan a fresh
    * one and leave these metrics empty) and consumes rows where they are —
    * nothing ships to the driver. */
  def shuffledRecords(df: DataFrame): Long = {
    df.queryExecution.toRdd.foreach(_ => ())
    shuffles(df.queryExecution.executedPlan)
      .map(_.metrics("shuffleRecordsWritten").value).sum
  }

  /** Rows each leaf scan actually produced (AQE unwrapped, distinct scan
    * instances), after running a full-plan action — the quantitative proof
    * of skipping: a partition-pruned or zone-mapped scan must output the
    * selected slice's rows, not the table's. Keyed by the scan's table/
    * location description so a spec can pick its relation. Matches BOTH
    * reader generations — DSv1 `FileSourceScanExec` (keyed by table id or
    * root paths) and DSv2 `BatchScanExec` (keyed by the Scan description,
    * which embeds the location) — so a source migrating to the v2 reader
    * cannot make a negative assertion ("table X never appears among the
    * scans") pass vacuously; specs should still pair every negative pin
    * with a positive scan assertion as a belt-and-braces guard. */
  def scannedRows(df: DataFrame): Seq[(String, Long)] = {
    df.queryExecution.toRdd.foreach(_ => ())
    def walk(p: SparkPlan): Seq[SparkPlan] =
      (p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec        => walk(q.plan)
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => Seq(b)
        case _                        => Seq.empty
      }) ++ p.children.flatMap(walk) ++ p.subqueries.flatMap(walk)
    distinctByIdentity(walk(df.queryExecution.executedPlan)).map {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        (s.tableIdentifier.map(_.toString)
            .getOrElse(s.relation.location.rootPaths.mkString(",")),
          s.metrics("numOutputRows").value)
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        // For file-based v2 scans, key by the UNTRUNCATED root paths:
        // Scan.description() abbreviates to spark.sql.maxMetadataStringLength
        // (~100 chars), which under a deep enough root cuts off the path
        // tail and would quietly re-open the vacuous-negative-pin hole.
        val key = b.scan match {
          case fs: org.apache.spark.sql.execution.datasources.v2.FileScan =>
            fs.fileIndex.rootPaths.mkString(",")
          case other => other.description()
        }
        (key, b.metrics("numOutputRows").value)
      case other =>
        // Fail LOUDLY, never fabricate: a silent nodeName key here would
        // reopen the vacuous-negative-pin hole (a key with no path in it
        // can never match "table X appears among the scans"). If walk
        // grows a third leaf case, this forces the mapping to grow too.
        throw new IllegalStateException(
          s"scannedRows: unmapped scan node ${other.nodeName} — " +
            "extend the key mapping alongside walk's new case")
    }
  }

  /** The shuffle exchanges of an executed plan: AQE roots and materialized
    * query stages are unwrapped to the plans that ran. Dedup is by
    * REFERENCE, not structure — physical nodes are case classes, so two
    * structurally identical but independently executed exchanges (each
    * carrying its own metric values) must both count, while an exchange a
    * ReusedExchange points back at counts once. */
  def shuffles(plan: SparkPlan): Seq[ShuffleExchangeLike] = {
    def walk(p: SparkPlan): Seq[ShuffleExchangeLike] = {
      val here = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec        => walk(q.plan)
        case s: ShuffleExchangeLike   => Seq(s)
        case _                        => Seq.empty
      }
      here ++ p.children.flatMap(walk) ++
        p.subqueries.flatMap(walk)
    }
    distinctByIdentity(walk(plan))
  }

  private def distinctByIdentity[T <: AnyRef](xs: Seq[T]): Seq[T] = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[T, java.lang.Boolean]())
    xs.filter(seen.add)
  }
}
