package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.SeriesSource

/** The `graft-series` DataSource V2's planning contracts: range pushdown
  * prunes PARTITIONS (not just rows), column pruning keeps the payload
  * unmaterialized, fully-absorbed predicates leave no residual Filter,
  * and reported statistics reflect the residual range. The cross-engine
  * answer gate is q258's DuckDB range() oracle; these pins are about
  * WHERE the work happens. */
class SeriesSourceSpec extends SparkSpec {

  private def series(end: Long, slices: Int = 32): DataFrame =
    spark.read.format("graft-series")
      .option("end", end).option("slices", slices).load()

  private def resetCounters(): Unit = {
    SeriesSource.rowsEmitted.set(0)
    SeriesSource.fillMaterialized.set(false)
  }

  test("range pushdown prunes slices at planning time: 8 of 32 partitions planned, residual rows only emitted") {
    val df = series(4000000L)
      .filter(col("id") >= 1500000L && col("id") < 2500000L)
    // [1.5M, 2.5M) over 32 slices of 125k = slices 12..19
    df.rdd.getNumPartitions shouldBe 8
    resetCounters()
    // aggregate over a DERIVED column: aggregate pushdown declines (it
    // only absorbs plain `id` aggregates), so rows genuinely scan — which
    // is the point: residual-range rows and nothing else
    val r = df.select((col("id") % 7L).as("m"))
      .agg(count(lit(1)).as("n"), sum(col("m"))).head()
    r.getLong(0) shouldBe 1000000L
    SeriesSource.rowsEmitted.get() shouldBe 1000000L
  }

  test("fully-absorbed range conjuncts leave NO residual Filter in the optimized plan") {
    val df = series(4000000L)
      .filter(col("id") >= 1500000L && col("id") < 2500000L)
    val filters = df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }
    filters shouldBe empty
  }

  test("column pruning: a query that never references fill gets readers that never materialize it") {
    resetCounters()
    series(100000L).filter(col("id") < 1000L)
      .groupBy((col("id") % 10).as("b")).agg(count(lit(1)).as("n"))
      .collect()
    SeriesSource.fillMaterialized.get() shouldBe false
    // and a query that DOES read fill flips the flag (the pin means
    // something)
    series(100L).select(col("fill")).collect()
    SeriesSource.fillMaterialized.get() shouldBe true
  }

  test("reported statistics are the RESIDUAL range's, so join planning sees pruned volume") {
    val pruned = series(4000000L).filter(col("id") < 10000L)
    val rel = pruned.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }.get
    rel.stats.sizeInBytes shouldBe BigInt(10000L * SeriesSource.RowBytes)
    rel.stats.rowCount shouldBe Some(BigInt(10000))
  }

  test("point lookup: EqualTo absorbs to a one-partition, one-row plan; an impossible range plans zero partitions") {
    val one = series(4000000L).filter(col("id") === 42L)
    one.rdd.getNumPartitions shouldBe 1
    resetCounters()
    one.collect().map(_.getLong(0)).toSeq shouldBe Seq(42L)
    SeriesSource.rowsEmitted.get() shouldBe 1L
    val none = series(4000000L).filter(col("id") < 0L)
    none.rdd.getNumPartitions shouldBe 0
    none.count() shouldBe 0L
  }

  test("aggregate pushdown: ungrouped count/min/max/sum over id answer with one arithmetic row per slice — no data rows scanned") {
    val df = series(50000000L)
      .filter(col("id") >= 10000000L && col("id") < 40000000L)
      .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"),
        max(col("id")).as("max_id"), sum(col("id")).as("sum_id"))
    resetCounters()
    val r = df.head()
    r.getLong(0) shouldBe 30000000L
    r.getLong(1) shouldBe 10000000L
    r.getLong(2) shouldBe 39999999L
    r.getLong(3) shouldBe
      ((BigInt(10000000L) + 39999999L) * 30000000L / 2).toLong
    // 30M ids crossed the aggregate, but only per-slice partial rows left
    // the source
    SeriesSource.rowsEmitted.get() should be <= 32L
    SeriesSource.rowsEmitted.get() should be >= 1L
    // the scan's output IS the pushed partial-agg schema, and reported
    // statistics describe the ≤32 partial rows, not the 30M-id range
    val rel = df.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }.get
    rel.output.map(_.name).forall(_.startsWith("agg_")) shouldBe true
    rel.stats.rowCount.get should be <= BigInt(32)
    // negative control: a GROUPED aggregate declines — rows scan normally
    resetCounters()
    series(1000L).groupBy((col("id") % 7L).as("g"))
      .agg(count(lit(1)).as("n")).collect()
    SeriesSource.rowsEmitted.get() shouldBe 1000L
  }

  test("edges: empty residual declines agg pushdown (count 0, min NULL — never a NULL count); Long.MaxValue bounds absorb without wrapping") {
    // empty residual + pushed-shape aggregate: pushdown DECLINES, Spark's
    // own aggregate over the empty scan gets count=0 / min=NULL right
    val r = series(100L).filter(col("id") > 200L)
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn")).head()
    r.getLong(0) shouldBe 0L
    r.isNullAt(1) shouldBe true
    // id > MaxValue is vacuously false — absorbed as empty, not wrapped
    // to MinValue (which would return ALL rows)
    series(1000L).filter(col("id") > Long.MaxValue).count() shouldBe 0L
    // id <= MaxValue is vacuously true — absorbed as a no-op, not wrapped
    // to an empty range (which would return NO rows)
    series(1000L).filter(col("id") <= Long.MaxValue).count() shouldBe 1000L
    // id = MaxValue lies outside any [start, end) series
    series(1000L).filter(col("id") === Long.MaxValue).count() shouldBe 0L
  }

  test("runtime filtering: a selective join hands the source the build keys — five rows emitted from a 4M-id series") {
    val d = "/root/testdata/sf0.001"
    val dim = Tables.nation(spark, d)
      .filter(col("n_regionkey") === 2)
      .select((graft.operators.TextOps.hash60(
        concat(lit("rf:"), col("n_nationkey").cast("string"))) % 4000000L)
        .as("wid"))
      .distinct()
    val nKeys = dim.count()
    nKeys should be > 0L
    val joined = series(4000000L).select(col("id"))
      .join(dim, col("id") === col("wid")).select(col("id"))
    // the injected dynamic pruning expression is visible on the scan
    joined.queryExecution.executedPlan.toString should include(
      "dynamicpruningexpression")
    resetCounters()
    val got = joined.collect().map(_.getLong(0)).toSet
    got.size.toLong shouldBe nKeys
    // the source emitted ONLY the build side's keys — not 4M rows, not
    // even one slice's worth
    SeriesSource.rowsEmitted.get() shouldBe nKeys
  }

  test("storage-partitioned join: same-layout series co-partition by construction — zero hash exchanges under the join; disabled, both sides shuffle") {
    def leg(tag: String) = series(1000000L)
      .select(col("id").as(s"${tag}id"), col("slice").as(s"${tag}slice"))
    def finalPlanExchanges(run: => org.apache.spark.sql.DataFrame): Int = {
      // ONE Dataset: materialize it, then inspect THAT QueryExecution —
      // a second .agg() would build a fresh, never-executed plan whose
      // AQE state says nothing about the run
      val agg = run.agg(count(lit(1)))
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      "Exchange hashpartitioning".r.findAllIn(plan).size
    }
    val spj = graft.SessionConf.withValue(spark,
        "spark.sql.sources.v2.bucketing.enabled", "true") {
      graft.SessionConf.withValue(spark,
          "spark.sql.requireAllClusterKeysForCoPartition", "false") {
        finalPlanExchanges(leg("a").join(leg("b"),
          col("aid") === col("bid") && col("aslice") === col("bslice")))
      }
    }
    spj shouldBe 0
    // negative control: without v2 bucketing the same join shuffles both legs
    val off = finalPlanExchanges(leg("a").join(leg("b"),
      col("aid") === col("bid") && col("aslice") === col("bslice")))
    off shouldBe 2
  }

  test("limit pushdown: a LIMIT over a 1M-row residual emits exactly that many rows and Spark's own Limit is deleted") {
    val df = series(4000000L)
      .filter(col("id") >= 1500000L && col("id") < 2500000L)
      .select(col("id")).limit(1000)
    resetCounters()
    val got = df.collect().map(_.getLong(0))
    got.length shouldBe 1000
    // complete pushdown: the window is the residual range's first 1000 ids
    got.min shouldBe 1500000L
    got.max shouldBe 1500999L
    SeriesSource.rowsEmitted.get() shouldBe 1000L
    // Spark deleted its own Limit — no limit operator survives optimization
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit => l
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalLimit => l
    } shouldBe empty
    val scan = df.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }.get
    scan.scan.description() should include("pushedLimit=1000")
    scan.stats.rowCount shouldBe Some(BigInt(1000))
  }

  test("top-N pushdown: ORDER BY id DESC LIMIT k deletes Spark's Sort, plans one ordered partition, emits k rows descending") {
    val df = series(4000000L).select(col("id"))
      .orderBy(col("id").desc).limit(5)
    df.rdd.getNumPartitions shouldBe 1
    resetCounters()
    df.collect().map(_.getLong(0)).toSeq shouldBe
      Seq(3999999L, 3999998L, 3999997L, 3999996L, 3999995L)
    SeriesSource.rowsEmitted.get() shouldBe 5L
    df.queryExecution.optimizedPlan.collect {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort => s
    } shouldBe empty
    df.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }.get.scan.description() should include("pushedOrder=id DESC")
    // negative control: a sort on a DERIVED column declines — Spark keeps
    // its Sort and the answer is still right
    val declined = series(1000L).select(col("id"), (col("id") % 7L).as("m"))
      .orderBy(col("m"), col("id")).limit(3)
    declined.collect().map(_.getLong(0)).toSeq shouldBe Seq(0L, 7L, 14L)
  }

  test("top-N pushdown reports REAL slices: the ordered partition derives each id's slice from the declared layout") {
    val top = series(4000000L).select(col("id"), col("slice"))
      .orderBy(col("id").desc).limit(3)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    top shouldBe Seq((3999999L, 31), (3999998L, 31), (3999997L, 31))
    // uneven layout, full window: derived slices must equal the unpushed
    // scan's partition-stamped slices for every id
    val truth = series(1000L, slices = 7).select(col("id"), col("slice"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    series(1000L, slices = 7).select(col("id"), col("slice"))
      .orderBy(col("id")).limit(1000)
      .collect().foreach(r => r.getInt(1) shouldBe truth(r.getLong(0)))
  }

  test("offset pushdown: offset/limit windows in both compositions match SQL semantics with no double skip") {
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.collect().map(_.getLong(0)).toSeq.sorted
    val base = series(1000L).select(col("id")).orderBy(col("id"))
    // OFFSET then LIMIT (SQL `LIMIT 10 OFFSET 100`): rows [100, 110)
    resetCounters()
    ids(base.offset(100).limit(10)) shouldBe (100L until 110L)
    SeriesSource.rowsEmitted.get() shouldBe 10L
    // LIMIT then OFFSET (take 10, skip 4): rows [4, 10)
    resetCounters()
    ids(base.limit(10).offset(4)) shouldBe (4L until 10L)
    SeriesSource.rowsEmitted.get() shouldBe 6L
    // offset alone pushes only directly above the relation (Spark's rule
    // does not push a bare Offset through a Sort): skip 990 of 1000
    val flat = series(1000L).select(col("id"))
    resetCounters()
    ids(flat.offset(990)) shouldBe (990L until 1000L)
    SeriesSource.rowsEmitted.get() shouldBe 10L
    // offset past the end: empty, zero rows emitted
    resetCounters()
    ids(flat.offset(2000)) shouldBe Seq.empty
    SeriesSource.rowsEmitted.get() shouldBe 0L
    // descending window with offset: skip the top 3, take the next 4
    ids(series(1000L).select(col("id")).orderBy(col("id").desc)
      .offset(3).limit(4)) shouldBe Seq(993L, 994L, 995L, 996L)
  }

  test("V2 custom metrics: rowsEmitted surfaces as a SQL metric on the executed scan") {
    val df = series(4000000L)
      .filter(col("id") >= 1500000L && col("id") < 2500000L)
      .select((col("id") % 7L).as("m")).agg(count(lit(1)), sum(col("m")))
    df.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
      (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          Seq(b)
        case _ => Seq.empty
      }) ++ p.children.flatMap(walk)
    val scan = walk(df.queryExecution.executedPlan).head
    scan.metrics("rowsEmitted").value shouldBe 1000000L
  }

  test("series content is the declared range exactly (min, max, count) and ids are dense") {
    val df = series(1000L, slices = 7)
    val r = df.agg(count(lit(1)), min(col("id")), max(col("id")),
      countDistinct(col("id"))).head()
    r.getLong(0) shouldBe 1000L
    r.getLong(1) shouldBe 0L
    r.getLong(2) shouldBe 999L
    r.getLong(3) shouldBe 1000L
  }
}
