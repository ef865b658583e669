package graft

import org.apache.spark.sql.functions._

/** q40's mergeable sketches, bounded against their exact twins: the sketch
  * path is only acceptable at 100 TB because its error is known — pin it. */
class SketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("approx sketches stay within bounds of the exact statistics") {
    val approx = SampleQueries.q40ApproxStats(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val sz = org.apache.spark.sql.functions.size _
    val exact = Tables.documents(spark, sf)
      .select(col("lang"), sz(graft.operators.TextOps.words(col("text"))).as("wc"),
        substring(col("text"), 1, 32).as("prefix32"))
      .groupBy(col("lang"))
      .agg(
        countDistinct(col("prefix32")).as("nd"),
        percentile(col("wc"), lit(0.5)).as("p50"),
        percentile(col("wc"), lit(0.99)).as("p99"))
      .collect().map(r => r.getString(0) -> r).toMap

    exact.keySet shouldBe approx.keySet
    exact.foreach { case (lang, e) =>
      val a = approx(lang)
      // HLL++ default rsd is 5%; allow 3 sigma
      val nd = e.getAs[Long]("nd").toDouble
      math.abs(a.getAs[Long]("approx_distinct_prefixes") - nd) should be <= (nd * 0.15 + 1)
      // approx_percentile returns the input's type (an actual int element);
      // at accuracy 10000 over small groups its rank error is tiny
      def num(r: org.apache.spark.sql.Row, f: String) = r.getAs[Number](f).doubleValue
      math.abs(num(a, "p50_approx") - num(e, "p50")) should be <= (num(e, "p50") * 0.05 + 1)
      math.abs(num(a, "p99_approx") - num(e, "p99")) should be <= (num(e, "p99") * 0.05 + 1)
    }
  }

  test("q54 sketch cutoff stays within rank-error bounds of the exact twin (q65)") {
    // approx_percentile guarantees the returned element's rank is within
    // n/accuracy of the requested p·n — assert exactly that, against the
    // same scored corpus, plus that the two kept-sets can only disagree on
    // rows whose score falls between the two thresholds.
    val approx = TextQueries.q54QualityCutoff(spark, sf).collect()
    val exact = TextQueries.q65QualityCutoffExact(spark, sf)
      .collect().map(r => r.getLong(0) -> r).toMap

    approx.length shouldBe exact.size
    val n = approx.length.toDouble
    val scores = approx.map(_.getDouble(2))
    // recover each threshold from the flags: smallest kept score is >= t
    // and every dropped score is < t, for both runs
    def threshold(rows: Array[(Double, Boolean)]): Double =
      rows.collect { case (q, true) => q }.min
    val tA = threshold(approx.map(r => r.getDouble(2) -> r.getBoolean(3)))
    val tE = threshold(exact.values.toArray.map(r => r.getDouble(2) -> r.getBoolean(3)))

    val rankErr = n / TextQueries.CUTOFF_ACCURACY + 1
    val below = scores.count(_ < tA).toDouble  // rows the sketch cut
    below should be >= (0.25 * n - rankErr - scores.count(_ == tA))
    below should be <= (0.25 * n + rankErr)

    val lo = math.min(tA, tE); val hi = math.max(tA, tE)
    approx.foreach { r =>
      val q = r.getDouble(2)
      if (q < lo || q > hi)
        r.getBoolean(3) shouldBe exact(r.getLong(0)).getBoolean(3)
    }
  }

  test("q231 column sketch stays within HLL/rank-error bounds of the exact profile (q91)") {
    val approx = OlapQueries.q231ColumnSketch(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = OlapQueries.q91ColumnStats(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    approx.keySet shouldBe exact.keySet

    // per-column sorted value lists for rank checks (test-side collect:
    // sf0.001 lineitem × 6 columns is spec-sized)
    val cols = approx.keySet.toSeq
    val vals: Map[String, Array[Double]] = cols.map { c =>
      c -> Tables.lineitem(spark, sf)
        .selectExpr(s"cast($c as double) as v").where(col("v").isNotNull)
        .collect().map(_.getDouble(0)).sorted
    }.toMap

    exact.foreach { case (cn, e) =>
      val a = approx(cn)
      // the non-sketched fields are the SAME aggregates — exactly equal
      a.getAs[Long]("n_rows") shouldBe e.getAs[Long]("n_rows")
      a.getAs[Long]("n_null") shouldBe e.getAs[Long]("n_null")
      a.getAs[Double]("min_v") shouldBe e.getAs[Double]("min_v")
      a.getAs[Double]("max_v") shouldBe e.getAs[Double]("max_v")
      // HLL++ default rsd 5%: allow 3σ
      val nd = e.getAs[Long]("ndv").toDouble
      math.abs(a.getAs[Long]("ndv_approx") - nd) should be <= (nd * 0.15 + 1)
      // approx_percentile's contract is a RANK guarantee: the returned
      // element's rank is within n/accuracy of p·n — assert exactly that
      // (value-domain tolerances would be vacuous for l_discount/l_tax)
      val v = vals(cn)
      val nv = v.length.toDouble
      val err = nv / 10000 + 1
      for ((p, f) <- Seq(0.25 -> "p25_approx", 0.5 -> "p50_approx",
                         0.75 -> "p75_approx")) {
        val ap = a.getAs[Double](f)
        val lt = v.count(_ < ap).toDouble  // rank range of ap is (lt, le]
        val le = v.count(_ <= ap).toDouble
        withClue(s"$cn $f=$ap: ") {
          lt should be <= (p * nv + err)
          le should be >= (p * nv - err)
        }
      }
    }
  }

  test("q152 Count-Min: estimates never underestimate; counters merge by element-wise addition") {
    // Structural guarantee: every occurrence of a word lands in its bucket's
    // counter, so min-over-rows can only overcount.
    val out = TextQueries.q152CountminFreq(spark, sf).collect()
    out should not be empty
    out.foreach { r =>
      r.getAs[Long]("cm_est") should be >= r.getAs[Long]("true_cnt")
      r.getAs[Long]("overcount") shouldBe
        r.getAs[Long]("cm_est") - r.getAs[Long]("true_cnt")
    }

    // Mergeability — the property that lets per-day/per-source sketches
    // roll up without a corpus re-scan: counters over the whole corpus ==
    // element-wise SUM of counters over any disjoint split.
    val docs = Tables.documents(spark, sf)
    def countersOf(df: org.apache.spark.sql.DataFrame) =
      TextQueries.cmCounters(TextQueries.cmItemCounts(df))
    val whole = countersOf(docs)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val halves = countersOf(docs.filter(col("doc_id") < 250))
      .union(countersOf(docs.filter(col("doc_id") >= 250)))
      .groupBy(col("r"), col("b")).agg(sum(col("c")).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    halves shouldBe whole
  }

  test("q176 HLL algebra: inclusion–exclusion is the exact integer identity; estimates track the exact set sizes") {
    val rows = OlapQueries.q176HllAlgebra(spark, "/root/testdata/sf0.01").collect()
    rows.length should be >= 1
    rows.foreach { r =>
      def l(f: String) = r.getAs[Long](f)
      // exact integer identity over the three floored milli-estimates
      l("est_inter_milli") shouldBe
        l("est_a_milli") + l("est_b_milli") - l("est_union_milli")
      // HLL at m=256 has rsd ≈ 1.04/√256 ≈ 6.5%; allow 3σ ≈ 20%
      def close(estMilli: Long, exact: Long, tol: Double): Unit =
        math.abs(estMilli / 1000.0 - exact) should be <= (exact * tol + 100)
      close(l("est_a_milli"), l("n_exact_a"), 0.20)
      close(l("est_b_milli"), l("n_exact_b"), 0.20)
      close(l("est_union_milli"), l("n_union_exact"), 0.20)
      // the intersection inherits the union terms' absolute errors — bound
      // it against the UNION size, the scale its error actually lives on
      math.abs(l("est_inter_milli") / 1000.0 - l("n_inter_exact")) should be <=
        (l("n_union_exact") * 0.30 + 100)
    }
  }

  test("q167 set algebra: inclusion–exclusion is the exact integer identity; estimates track the exact set sizes") {
    // sf0.01: per-type audiences ≈ thousands on an 8192-bit bitmap —
    // squarely in linear counting's accurate occupancy regime
    val rows = OlapQueries.q167SketchAlgebra(spark, "/root/testdata/sf0.01").collect()
    rows.length should be >= 1
    rows.foreach { r =>
      def l(f: String) = r.getAs[Long](f)
      // the intersection estimate IS the subtraction of the three floored
      // milli-estimates — an integer identity, not an approximation
      l("est_inter_milli") shouldBe
        l("est_a_milli") + l("est_b_milli") - l("est_union_milli")
      // no saturation sentinel at this occupancy
      l("est_a_milli") should be >= 0L
      l("est_union_milli") should be >= 0L
      // LC standard error at m=8192, n≈6k is ~1.5%; allow generous 10%+50
      def close(estMilli: Long, exact: Long): Unit =
        math.abs(estMilli / 1000.0 - exact) should be <= (exact * 0.10 + 50)
      close(l("est_a_milli"), l("n_exact_a"))
      close(l("est_b_milli"), l("n_exact_b"))
      close(l("est_union_milli"), l("n_union_exact"))
      close(l("est_inter_milli"), l("n_inter_exact"))
    }
  }

  test("q235 stored sketches: estimates within DataSketches bounds of exact; serve never rescans events") {
    val got = OlapQueries.q235SketchStore(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("users_approx"),
          r.getAs[Double]("p50_value_approx")))).toMap

    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"), col("value"))
    val exact = ev.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("du"))
      .collect().map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("du")))).toMap
    got.keySet shouldBe exact.keySet

    exact.foreach { case (t, (n, du)) =>
      val (gn, gu, gp50) = got(t)
      gn shouldBe n // the non-sketch aggregate is exact through the store
      // HLL default lgConfigK=12: rsd ≈ 1.04/√2¹² ≈ 1.6% — allow 3σ
      math.abs(gu - du).toDouble should be <= (du * 0.05 + 1)
      // KLL default k=200 ⇒ ε ≈ 1.65% rank error — the returned p50's
      // rank among this type's exact values must sit within 3·n/100 + 1
      val vals = ev.filter(col("event_type") === t && col("value").isNotNull)
        .collect().map(_.getAs[Double]("value")).sorted
      val lt = vals.count(_ < gp50).toDouble
      val le = vals.count(_ <= gp50).toDouble
      val err = 3.0 * vals.length / 100 + 1
      withClue(s"$t p50=$gp50 rank∈($lt,$le] of ${vals.length}: ") {
        lt should be <= (0.5 * vals.length + err)
        le should be >= (0.5 * vals.length - err)
      }
    }

    // the architecture's point, pinned: the serving plan reads ONLY the
    // day-grain store — the events fact never appears among its scans
    val scans = Metrics.scannedRows(OlapQueries.q235SketchStore(spark, sf))
    withClue(s"serve scans $scans: ") {
      scans.map(_._1).exists(_.contains("graft_sketch_daily")) shouldBe true
      scans.map(_._1).exists(_.contains("events.parquet")) shouldBe false
    }

    // and the store is day-grain small: days × types rows, sketch bytes
    val store = OlapQueries.sketchDailyStore(spark, sf)
    store.count() should be < 400L // ~90 days × 4 types at sf0.001
  }

  test("q238 profile history: merged day-grain states within sketch bounds of the exact range profile; serve never rescans events") {
    profileRangeBounds(28, OlapQueries.q238ProfileHistory(spark, sf))
  }

  test("q241 range-7 serve: the SAME store answers a different window within the same bounds — range independence") {
    profileRangeBounds(7, OlapQueries.q241ProfileRange7(spark, sf))
  }

  /** The q238/q241 bound suite, parameterized by the trailing-day range:
    * the store is built once; only the serve filter differs. */
  private def profileRangeBounds(days: Int,
      serveDf: org.apache.spark.sql.DataFrame): Unit = {
    val got = serveDf.collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    got.keySet shouldBe OlapQueries.PROFILE_COLS.toSet

    // the exact twin: the SAME trailing-day range over the SAME shared
    // unpivot (OlapQueries.profileStacked — one definition, no drift),
    // computed straight from the events fact; NDV over the string of the
    // ORIGINAL value, exactly what the store's HLL sketched
    val store = OlapQueries.profileDailyStore(spark, sf)
    val maxDay = store.agg(max(col("day"))).collect()(0).getDate(0)
    val stacked = OlapQueries.profileStacked(spark, sf)
      .filter(col("day") > date_sub(lit(maxDay), days))
    val exact = stacked.groupBy(col("col_name")).agg(
        count(lit(1)).as("n"),
        (count(lit(1)) - count(col("v"))).as("nn"),
        countDistinct(col("vs")).as("ndv"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    exact.keySet shouldBe got.keySet
    // ONE collect of the range's numeric values, grouped in memory — the
    // per-quantile rank checks below index into it per column
    val valsByCol = stacked.filter(col("v").isNotNull)
      .select(col("col_name"), col("v")).collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }

    exact.foreach { case (c, e) =>
      val g = got(c)
      withClue(s"$c: ") {
        // the monoid fields pass through the store exactly
        g.getAs[Long]("n_rows") shouldBe e.getAs[Long]("n")
        g.getAs[Long]("n_null") shouldBe e.getAs[Long]("nn")
        g.getAs[Double]("min_v") shouldBe e.getAs[Double]("mn")
        g.getAs[Double]("max_v") shouldBe e.getAs[Double]("mx")
        // HLL lgConfigK=12: rsd ≈ 1.6% — allow 3σ (and +1 for tiny groups)
        val ndv = e.getAs[Long]("ndv").toDouble
        math.abs(g.getAs[Long]("ndv_approx") - ndv) should be <= (ndv * 0.05 + 1)
        // KLL k=200 ⇒ ~1.65% rank error: each returned quantile's rank
        // among the exact values must sit within 3·n/100 + 1 of its target
        val vals = valsByCol(c)
        val err = 3.0 * vals.length / 100 + 1
        for ((q, f) <- Seq(0.25 -> "p25_approx", 0.5 -> "p50_approx",
            0.75 -> "p75_approx")) {
          val gq = g.getAs[Double](f)
          val lt = vals.count(_ < gq).toDouble
          val le = vals.count(_ <= gq).toDouble
          withClue(s"$f=$gq rank∈($lt,$le] of ${vals.length}: ") {
            lt should be <= (q * vals.length + err)
            le should be >= (q * vals.length - err)
          }
        }
      }
    }

    // serve isolation, q235's discipline: the serving plan reads ONLY the
    // day-grain profile store — the events fact never appears
    val scans = Metrics.scannedRows(OlapQueries.profileServe(spark, sf, days))
    withClue(s"serve scans $scans: ") {
      scans.map(_._1).exists(_.contains("graft_profile_daily")) shouldBe true
      scans.map(_._1).exists(_.contains("events.parquet")) shouldBe false
    }

    // day-grain small: days × |PROFILE_COLS| rows regardless of corpus size
    store.count() should be < 300L // ~90 days × 3 columns at sf0.001
  }
}
