package graft

import org.apache.spark.sql.functions._

/** Driver-visible sketch-error evidence — the `work/streaming_r12.json`
  * pattern applied to the five rows-only-by-design sketch queries
  * (round-13 verdict #1): the correctness artifact records them as
  * `no_oracle` because sketch internals differ across engines, and their
  * error bounds live only in a green `sbt test` (SketchSpec). This main
  * re-runs exactly those bounds against a REAL scale dir and records every
  * measured-error-vs-bound inequality in a committed JSON artifact, so the
  * by-design rows carry auditable numeric evidence in the same file chain
  * as the hash gate.
  *
  * Pairings (identical to SketchSpec, which stays the regression gate):
  *  - q40 approx stats        vs the exact per-lang profile (anchor q70);
  *  - q54 sketch cutoff       vs q65's exact-percentile twin;
  *  - q231 column sketch      vs q91's exact column profile;
  *  - q235 stored sketches    vs the exact events aggregate;
  *  - q238 profile history    vs the exact trailing-28-day range profile
  *    over the SAME shared unpivot;
  *  - q241 range-7 serve      vs the exact trailing-7-day range profile —
  *    the SAME store answering a second window (range independence).
  *
  * Every row is one inequality: {query, check, value, op, bound, pass}
  * with op ∈ {<=, >=, ==} — `value` is the measured quantity (an absolute
  * estimation error, a rank, a disagreement count, a pass-through
  * aggregate) and `bound` is the sketch's published guarantee (HLL++ rsd,
  * approx_percentile's n/accuracy rank contract, KLL k=200 rank error) at
  * 3σ, exactly as SketchSpec derives them.
  *
  * Usage: `runMain graft.SketchEvidence [sfDir] [outFile]`
  * (defaults: /root/testdata/sf0.01, work/sketch_bounds_r13.json). Exit 1
  * if any inequality fails — evidence of a failure must never look like
  * evidence.
  */
object SketchEvidence {

  final case class Check(query: String, check: String, value: Double,
      op: String, bound: Double) {
    def pass: Boolean = op match {
      case "<=" => value <= bound
      case ">=" => value >= bound
      case "==" => value == bound
    }
    def json: String =
      s"""{"query":"$query","check":"$check","value":$value,""" +
        s""""op":"$op","bound":$bound,"pass":$pass}"""
  }

  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val outFile = if (args.length > 1) args(1) else "work/sketch_bounds_r13.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val checks = scala.collection.mutable.ArrayBuffer[Check]()

    // ---- q40 vs the exact per-lang profile (q70 anchor) ----------------
    locally {
      val approx = SampleQueries.q40ApproxStats(spark, sf)
        .collect().map(r => r.getString(0) -> r).toMap
      val exact = Tables.documents(spark, sf)
        .select(col("lang"),
          size(graft.operators.TextOps.words(col("text"))).as("wc"),
          substring(col("text"), 1, 32).as("prefix32"))
        .groupBy(col("lang"))
        .agg(countDistinct(col("prefix32")).as("nd"),
          percentile(col("wc"), lit(0.5)).as("p50"),
          percentile(col("wc"), lit(0.99)).as("p99"))
        .collect().map(r => r.getString(0) -> r).toMap
      // symmetric difference — union-size-vs-exact only proves approx ⊆
      // exact and lets a dropped group pass the check then crash the loop
      checks += Check("q40_approx_stats", "lang_sets_equal",
        ((approx.keySet -- exact.keySet) ++ (exact.keySet -- approx.keySet))
          .size.toDouble, "==", 0)
      exact.foreach { case (lang, e) => approx.get(lang).foreach { a =>
        def num(r: org.apache.spark.sql.Row, f: String) =
          r.getAs[Number](f).doubleValue
        val nd = e.getAs[Long]("nd").toDouble
        // HLL++ default rsd 5%: 3σ
        checks += Check("q40_approx_stats", s"$lang ndv_abs_err",
          math.abs(a.getAs[Long]("approx_distinct_prefixes") - nd),
          "<=", nd * 0.15 + 1)
        checks += Check("q40_approx_stats", s"$lang p50_abs_err",
          math.abs(num(a, "p50_approx") - num(e, "p50")),
          "<=", num(e, "p50") * 0.05 + 1)
        checks += Check("q40_approx_stats", s"$lang p99_abs_err",
          math.abs(num(a, "p99_approx") - num(e, "p99")),
          "<=", num(e, "p99") * 0.05 + 1)
      } }
    }

    // ---- q54 vs q65 (exact-percentile cutoff twin) ---------------------
    locally {
      val approx = TextQueries.q54QualityCutoff(spark, sf).collect()
      val exact = TextQueries.q65QualityCutoffExact(spark, sf)
        .collect().map(r => r.getLong(0) -> r).toMap
      checks += Check("q54_quality_cutoff", "row_count",
        approx.length.toDouble, "==", exact.size.toDouble)
      val n = approx.length.toDouble
      val scores = approx.map(_.getDouble(2))
      def threshold(rows: Array[(Double, Boolean)]): Double =
        rows.collect { case (q, true) => q }.min
      val tA = threshold(approx.map(r => r.getDouble(2) -> r.getBoolean(3)))
      val tE = threshold(exact.values.toArray
        .map(r => r.getDouble(2) -> r.getBoolean(3)))
      // approx_percentile's contract: returned element's rank within
      // n/accuracy of 0.25·n
      val rankErr = n / TextQueries.CUTOFF_ACCURACY + 1
      val below = scores.count(_ < tA).toDouble
      checks += Check("q54_quality_cutoff", "cut_count_rank",
        below, "<=", 0.25 * n + rankErr)
      checks += Check("q54_quality_cutoff", "cut_count_rank",
        below, ">=", 0.25 * n - rankErr - scores.count(_ == tA))
      // outside the [tA, tE] band the two kept-sets must agree exactly
      val lo = math.min(tA, tE); val hi = math.max(tA, tE)
      val disagree = approx.count { r =>
        val q = r.getDouble(2)
        (q < lo || q > hi) &&
          r.getBoolean(3) != exact(r.getLong(0)).getBoolean(3)
      }
      checks += Check("q54_quality_cutoff", "kept_disagreements_outside_band",
        disagree.toDouble, "==", 0.0)
    }

    // ---- q231 vs q91 (exact column profile) ----------------------------
    locally {
      val approx = OlapQueries.q231ColumnSketch(spark, sf)
        .collect().map(r => r.getString(0) -> r).toMap
      val exact = OlapQueries.q91ColumnStats(spark, sf)
        .collect().map(r => r.getString(0) -> r).toMap
      checks += Check("q231_column_sketch", "column_sets_equal",
        ((approx.keySet -- exact.keySet) ++ (exact.keySet -- approx.keySet))
          .size.toDouble, "==", 0)
      val vals: Map[String, Array[Double]] = approx.keySet.toSeq.map { c =>
        c -> Tables.lineitem(spark, sf)
          .selectExpr(s"cast($c as double) as v").where(col("v").isNotNull)
          .collect().map(_.getDouble(0)).sorted
      }.toMap
      exact.foreach { case (cn, e) => approx.get(cn).foreach { a =>
        // non-sketched fields are the same aggregates — exactly equal
        checks += Check("q231_column_sketch", s"$cn n_rows_passthrough",
          a.getAs[Long]("n_rows").toDouble, "==", e.getAs[Long]("n_rows").toDouble)
        checks += Check("q231_column_sketch", s"$cn n_null_passthrough",
          a.getAs[Long]("n_null").toDouble, "==", e.getAs[Long]("n_null").toDouble)
        checks += Check("q231_column_sketch", s"$cn min_passthrough",
          a.getAs[Double]("min_v"), "==", e.getAs[Double]("min_v"))
        checks += Check("q231_column_sketch", s"$cn max_passthrough",
          a.getAs[Double]("max_v"), "==", e.getAs[Double]("max_v"))
        val nd = e.getAs[Long]("ndv").toDouble
        checks += Check("q231_column_sketch", s"$cn ndv_abs_err",
          math.abs(a.getAs[Long]("ndv_approx") - nd), "<=", nd * 0.15 + 1)
        // rank contract of approx_percentile at accuracy 10000
        val v = vals(cn)
        val nv = v.length.toDouble
        val err = nv / 10000 + 1
        for ((p, f) <- Seq(0.25 -> "p25_approx", 0.5 -> "p50_approx",
            0.75 -> "p75_approx")) {
          val ap = a.getAs[Double](f)
          checks += Check("q231_column_sketch", s"$cn $f rank_lt",
            v.count(_ < ap).toDouble, "<=", p * nv + err)
          checks += Check("q231_column_sketch", s"$cn $f rank_le",
            v.count(_ <= ap).toDouble, ">=", p * nv - err)
        }
      } }
    }

    // ---- q235 vs the exact events aggregate ----------------------------
    locally {
      val got = OlapQueries.q235SketchStore(spark, sf).collect()
        .map(r => r.getAs[String]("event_type") ->
          ((r.getAs[Long]("n_rows"), r.getAs[Long]("users_approx"),
            r.getAs[Double]("p50_value_approx")))).toMap
      val ev = Tables.events(spark, sf)
        .select(col("event_type"), col("user_id"), col("value"))
      val exact = ev.groupBy(col("event_type")).agg(
          count(lit(1)).as("n"), countDistinct(col("user_id")).as("du"))
        .collect().map(r => r.getAs[String]("event_type") ->
          ((r.getAs[Long]("n"), r.getAs[Long]("du")))).toMap
      checks += Check("q235_sketch_store", "type_sets_equal",
        ((got.keySet -- exact.keySet) ++ (exact.keySet -- got.keySet))
          .size.toDouble, "==", 0)
      exact.foreach { case (t, (n, du)) => got.get(t).foreach { case (gn, gu, gp50) =>
        checks += Check("q235_sketch_store", s"$t n_rows_passthrough",
          gn.toDouble, "==", n.toDouble)
        // DataSketches HLL lgConfigK=12: rsd ≈ 1.6%, 3σ
        checks += Check("q235_sketch_store", s"$t users_abs_err",
          math.abs(gu - du).toDouble, "<=", du * 0.05 + 1)
        // KLL k=200 ⇒ ~1.65% rank error, 3σ ⇒ 3·n/100 + 1
        val vals = ev.filter(col("event_type") === t && col("value").isNotNull)
          .collect().map(_.getAs[Double]("value")).sorted
        val err = 3.0 * vals.length / 100 + 1
        checks += Check("q235_sketch_store", s"$t p50 rank_lt",
          vals.count(_ < gp50).toDouble, "<=", 0.5 * vals.length + err)
        checks += Check("q235_sketch_store", s"$t p50 rank_le",
          vals.count(_ <= gp50).toDouble, ">=", 0.5 * vals.length - err)
      } }
    }

    // ---- q238/q241 vs the exact trailing-range profiles ----------------
    // Two ranges through the SAME store — range independence on the
    // artifact chain (q241, round-13 verdict #7).
    for ((qname, days) <- Seq("q238_profile_history" -> 28,
        "q241_profile_range7" -> 7)) {
      val got = OlapQueries.profileServe(spark, sf, days).collect()
        .map(r => r.getAs[String]("col_name") -> r).toMap
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
      checks += Check(qname,"column_sets_equal",
        ((got.keySet -- exact.keySet) ++ (exact.keySet -- got.keySet))
          .size.toDouble, "==", 0)
      val valsByCol = stacked.filter(col("v").isNotNull)
        .select(col("col_name"), col("v")).collect()
        .groupBy(_.getString(0))
        .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
      exact.foreach { case (c, e) => got.get(c).foreach { g =>
        checks += Check(qname,s"$c n_rows_passthrough",
          g.getAs[Long]("n_rows").toDouble, "==", e.getAs[Long]("n").toDouble)
        checks += Check(qname,s"$c n_null_passthrough",
          g.getAs[Long]("n_null").toDouble, "==", e.getAs[Long]("nn").toDouble)
        checks += Check(qname,s"$c min_passthrough",
          g.getAs[Double]("min_v"), "==", e.getAs[Double]("mn"))
        checks += Check(qname,s"$c max_passthrough",
          g.getAs[Double]("max_v"), "==", e.getAs[Double]("mx"))
        val ndv = e.getAs[Long]("ndv").toDouble
        checks += Check(qname,s"$c ndv_abs_err",
          math.abs(g.getAs[Long]("ndv_approx") - ndv), "<=", ndv * 0.05 + 1)
        val vals = valsByCol.getOrElse(c, Array.empty[Double])
        val err = 3.0 * vals.length / 100 + 1
        for ((q, f) <- Seq(0.25 -> "p25_approx", 0.5 -> "p50_approx",
            0.75 -> "p75_approx")) {
          val gq = g.getAs[Double](f)
          checks += Check(qname,s"$c $f rank_lt",
            vals.count(_ < gq).toDouble, "<=", q * vals.length + err)
          checks += Check(qname,s"$c $f rank_le",
            vals.count(_ <= gq).toDouble, ">=", q * vals.length - err)
        }
      } }
    }

    val allPass = checks.forall(_.pass)
    val perQuery = checks.groupBy(_.query).toSeq.sortBy(_._1).map {
      case (q, cs) =>
        s"""{"query":"$q","checks":${cs.size},""" +
          s""""failed":${cs.count(!_.pass)},"pass":${cs.forall(_.pass)}}"""
    }
    val json =
      s"""{"sf":"$sf","pass":$allPass,
         |"summary":[${perQuery.mkString(",\n")}],
         |"checks":[
         |${checks.map(_.json).mkString(",\n")}
         |]}""".stripMargin
    Evidence.writeArtifact(outFile, json, echo = false)
    println(s"""{"checks":${checks.size},"failed":${checks.count(!_.pass)},""" +
      s""""pass":$allPass}""")
    spark.stop()
    if (!allPass) sys.exit(1)
  }
}
