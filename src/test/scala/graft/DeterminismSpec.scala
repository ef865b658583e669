package graft

/** Partitioning-invariance sweep: every catalog result must be a pure
  * function of the DATA, never of the physical execution — the property
  * the decimal-sum, integer-cross-multiplication, and shared-text-float
  * disciplines exist to guarantee, and the reason the DuckDB gate can
  * hash-compare at all. This spec re-runs a family-spanning sample of
  * queries in a sibling session with a hostile shuffle-partition count
  * (7, coprime to everything) and asserts bit-identical row sets.
  * A failure here means some operator leaks execution order (a float
  * partial-sum, an undeclared tiebreak) that a single-config run — and a
  * lucky gate — could miss.
  */
class DeterminismSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // one per family: scan/agg, text, window, sketch, histogram, linkage,
  // advisor, drift, weighted stats, set algebra, graph traversal,
  // moment statistics, concentration, min-plus paths, time series,
  // reconciliation
  private val sample = Seq(
    "q01_pricing_summary", "q17_token_count", "q95_window_suite",
    "q147_transition_matrix", "q163_trending_decay",
    "q167_sketch_algebra", "q168_histogram_percentiles",
    "q171_changepoint", "q172_record_linkage", "q174_ks_test",
    "q175_weighted_percentiles", "q176_hll_algebra",
    "q178_bfs_khop", "q179_corr_matrix", "q181_gini",
    "q182_range_frame", "q183_moment_shape", "q184_rake_keywords",
    "q185_feature_hashing", "q186_winsorize", "q187_negative_sampling",
    "q188_cuped", "q189_log_histogram", "q190_federated_join",
    "q200_sssp", "q203_autocorr", "q208_iblt_reconcile")

  test("results are invariant to the shuffle-partition count (7 vs the default)") {
    val hostile = spark.newSession()
    hostile.conf.set("spark.sql.shuffle.partitions", "7")
    sample.foreach { name =>
      val q = SparkEntry.queries(name)
      withClue(s"$name: ") {
        val base = q(spark, sf).collect().map(_.toString).sorted
        val alt = q(hostile, sf).collect().map(_.toString).sorted
        alt shouldBe base
        base.nonEmpty shouldBe true
      }
    }
  }
}
