package graft

/** Executed-plan VOLUME pins ([[Metrics]]): PlanSpec proves the shapes,
  * these prove the amounts — each budget is an order-of-magnitude fence
  * between the intended communication complexity and the naive one, far
  * above run-to-run wiggle (shuffle record counts are deterministic for a
  * fixed input+plan; the headroom covers partition-count drift only). */
class MetricsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val DOCS = 500L // documents rows at sf0.001

  test("q01 aggregate: raw rows cross at most the layout rebalance; the aggregation ships group partials") {
    // The layout-adaptive compute rebalance (fires at this one-file input;
    // a plan-pinned NO-OP at ≥ core-count input partitions — the cluster
    // case) moves the 6000 projected lineitem rows ONCE; the aggregation
    // exchange still carries only 4-group partials. A plan that lost
    // map-side combine would put the rows through a SECOND keyed exchange.
    val n = Metrics.shuffledRecords(Queries.q01PricingSummary(spark, sf))
    withClue(s"shuffled $n: ") { n should (be > 0L and be <= 6000L + 600L) }
  }

  test("q231 sketch profile: raw rows cross at most the layout rebalance; the aggregation ships sketch partials") {
    // one conditional rebalance pass of the 6000 projected rows (no-op at
    // cluster inputs, see PlanSpec) — the 36k unpivoted cells must still
    // never travel: the sketch exchange carries ≤ 6 groups × partials
    val n = Metrics.shuffledRecords(OlapQueries.q231ColumnSketch(spark, sf))
    withClue(s"shuffled $n: ") { n should (be > 0L and be <= 6000L + 600L) }
  }

  test("q21 MinHash-LSH total shuffle volume is O(docs·bands), never O(docs²)") {
    // 32 band keys/doc plus the verified-candidate traffic; the all-pairs
    // alternative would put ~docs²/2 = 125k candidate rows through the
    // exchanges before verification even starts
    val n = Metrics.shuffledRecords(
      DedupQueries.q21DedupMinhashLsh(spark, sf))
    withClue(s"shuffled $n: ") { n should (be > 0L and be <= 36 * DOCS) }
  }

  test("q199 Gram matrix ships the 2080-cell triangle per partition, never vectors") {
    val n = Metrics.shuffledRecords(ClusterQueries.q199GramMatrix(spark, sf))
    withClue(s"shuffled $n: ") { n should (be > 0L and be <= 2080L * 8) }
  }

  test("q128 zone map: only intersecting files are read — rows scanned ≪ table rows") {
    // the [ZM_LO, ZM_HI] slice lives in a fraction of the value-clustered
    // files; a scan that ignored the zone map would read all 10k events
    val scans = Metrics.scannedRows(ScaleQueries.q128ZoneMap(spark, sf))
    val read = scans.map(_._2).sum
    withClue(s"scanned $scans: ") { read should (be > 0L and be < 2500L) }
  }

  test("q128 zone map: the consult's ONLY scan is the persisted sidecar — file-count rows, never the layout") {
    // the round-11 `weak`: the consult used to rebuild the zone map from
    // every layout row on every execution. Now the map is a write-once
    // sidecar; this pins "metadata ∝ files, not rows" as an executed-plan
    // fact, not a docstring claim. (Negative pin paired with a positive
    // scan assertion per the Metrics scaladoc.)
    val (dir, idx) = ScaleQueries.zoneMapLayout(spark, sf)
    // one sidecar row per ACTUAL layout file — derived, not the ZM_FILES
    // constant: an empty range partition at a tiny/skewed scale would drop
    // a file, and that must not fail the sidecar-only-consult pin
    val layoutFiles = spark.read.parquet(dir)
      .select(org.apache.spark.sql.functions.input_file_name())
      .distinct().count()
    val scans = Metrics.scannedRows(ScaleQueries.zoneMapConsult(spark, idx))
    withClue(s"scanned $scans (layout has $layoutFiles files): ") {
      scans should have size 1                        // exactly one relation read
      scans.head._1 should include("graft_events_zmidx") // …and it is the sidecar
      scans.head._2 shouldBe layoutFiles              // one row per file
      scans.head._2 should be > 1L                    // …and it is file-grain, not a blob
      scans.map(_._1).exists(k =>
        k.contains("graft_events_zm_") || k.contains("events.parquet")) shouldBe false
    }
  }

  test("q245 MV rewrite: the served aggregate reads summary rows only — corpus rows never enter the plan") {
    val mvd = ScaleQueries.q245MvDef(spark, sf)
    val mvRows = spark.read.parquet(
      mvd.mv.relation.asInstanceOf[
        org.apache.spark.sql.execution.datasources.HadoopFsRelation]
        .location.rootPaths.head.toString).count()
    graft.plans.MvCatalog.withMv(spark, mvd) {
      val scans = Metrics.scannedRows(ScaleQueries.q245Direct(spark, sf))
      withClue(s"scans $scans: ") {
        scans should have size 1
        scans.head._1 should include("graft_docs_mv_")
        scans.head._2 shouldBe mvRows // every summary row, no corpus row
        mvRows should be < DOCS // and the summary is smaller than the corpus
      }
    }
  }

  test("q52 IVF probe: DPP reads exactly the probed cells' rows from the cell layout") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    // The property is EXACT pruning, not a magnitude: this corpus's cell
    // assignment is heavily skewed (one centroid captures ~80% of vectors
    // at sf0.001), so "rows ≪ table" would be vacuous or flaky — instead
    // the layout relation must output precisely the rows of the one
    // query's nprobe probed cells, no more. (The unpartitioned embeddings
    // scan in the same plan BUILT the layout and legitimately reads 500.)
    val one = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
    val scans = Metrics.scannedRows(
      SimilarityQueries.ivfPrunedWith(spark, sf, one))
    val layout = scans.filter(_._1.contains("graft_emb_ivf")).map(_._2).sum

    val native = spark.catalog.functionExists("l2_sq")
    val probed = Similarity.cellProbes(one, SimilarityQueries.cents,
        SimilarityQueries.NPROBE, native)
      .select(col("cell")).collect().map(_.getInt(0)).toSet
    val expected = Tables.embeddings(spark, sf)
      .withColumn("cell", Similarity.cellAssign(SimilarityQueries.cents, native))
      .filter(col("cell").isin(probed.toSeq: _*)).count()
    withClue(s"scanned $scans, probed cells $probed: ") {
      layout shouldBe expected
      layout should be < 500L // and the pruning really skipped something
    }
  }

  test("q153 IVM steady state: base rows cross at most the layout rebalance — joins stay broadcast, aggregates ship partials") {
    // every delta term broadcasts its (tiny) delta side, so the base
    // orders/lineitem rows reach no JOIN exchange; the only raw-row
    // movement is the layout-adaptive rebalance before the md5 arm split
    // (one pass of the 6000 + 1500 projected base rows here; a plan-pinned
    // no-op at ≥ core-count inputs). A full re-join would ALSO put the
    // rows through keyed join exchanges every refresh — that is what the
    // bound excludes (one pass + partial cells, never two).
    val n = Metrics.shuffledRecords(ScaleQueries.q153IvmJoin(spark, sf))
    withClue(s"shuffled $n: ") { n should (be > 0L and be <= 7500L + 2000L) }
  }

  test("q73/q78 incremental dedup: corpus state is read, never re-shuffled") {
    // the whole point of the incremental path: the banded corpus state
    // (~14k band rows here) and the corpus docs stream through broadcast
    // probes — only the incoming batch's collapsed partials reach an
    // exchange (measured: 11 and 13 records respectively)
    for ((name, df) <- Seq(
        "q73" -> DedupQueries.q73IncrementalDedup(spark, sf),
        "q78" -> DedupQueries.q78IncrementalRefresh(spark, sf))) {
      val n = Metrics.shuffledRecords(df)
      withClue(s"$name shuffled $n: ") { n should (be > 0L and be <= 200L) }
    }
  }

  test("q234 payload drift collapses the per-line key fanout map-side") {
    // ≤ |event types| × |fields| cells per map partition (85 live cells);
    // the naive plan shuffles every exploded key — 10k lines × ~17 keys
    val n = Metrics.shuffledRecords(
      IngestQueries.q234PayloadDrift(spark, sf))
    withClue(s"shuffled $n: ") { n should (be > 0L and be <= 2000L) }
  }
}
