package graft

import org.apache.spark.sql.SparkSession

/** One place to construct engine sessions (the Spark analog of the
  * reference's cluster/config layer, redshift_cluster_generator.py:6-239 —
  * there the "session" was a Redshift cluster; here it is a SparkSession).
  *
  * Conventions baked in once so no loader has to mutate session state:
  *  - UTC session time zone (epoch-ms data is zone-less; oracle is UTC);
  *  - `spark.sql.legacy.parquet.nanosAsLong`: the driver testdata's
  *    `events.parquet` carries TIMESTAMP(NANOS), which Spark's reader
  *    otherwise rejects — surface it as int64 nanos and convert explicitly;
  *  - AQE on (runtime re-plan: skew joins, partition coalescing at scale);
  *  - shuffle partitions sized to the local core count (on a real cluster
  *    this would be ~2-3× total executor cores, or left to AQE).
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // the generated-class cache defaults to 100 entries — a 275-query
      // session thrashes it, paying Janino recompilation per query and
      // flooding the JIT code cache; sized to hold the whole catalog
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      // NOTE: `canChangeCachedPlanOutputPartitioning` stays at Spark's
      // default here. The keyed graph loops — the only plans that need a
      // persisted edge list to KEEP its hash(src,np) partitioning across
      // rounds — pin it via GraphQueries.withPinnedCachedPartitioning
      // (scoped set/restore); session-wide the pin costs every OTHER
      // cache-heavy query the AQE re-plan it wants (round-10 bench:
      // q84/q82/q79/q81 regressions, adjudicated in work/ab_cached_replan).
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      // catalog-resolved V2 functions (SELECT graft_fns.fns.hash60(...)):
      // resolution is lazy, so the conf costs nothing until referenced
      .config("spark.sql.catalog.graft_fns",
        classOf[graft.sources.GraftFunctionCatalog].getName)
      // the engine's lake-table layer (SQL DDL/DML + time travel over
      // versioned-manifest tables): spark.sql("... graft_cat.db.t ...")
      .config("spark.sql.catalog.graft_cat",
        classOf[graft.sources.GraftTableCatalog].getName)
      // absolute, like warehouse.dir: catalog tables must land inside
      // the repo regardless of where the harness launches us
      .config("spark.sql.catalog.graft_cat.root", "/root/repo/work/graft_cat")
      // Pinned: the default derives from the process cwd, and managed
      // tables (bucketed joins) must land inside the repo regardless of
      // where the harness launches us.
      .config("spark.sql.warehouse.dir", "/root/repo/work/warehouse")
      .config("spark.ui.enabled", "false")
      // The UI is off, but every execution still feeds the driver's
      // in-memory status store — at Spark defaults it retains 1000 jobs,
      // 1000 stages, 100k tasks and 1000 SQL executions WITH plan graphs
      // and metric maps. A full 282-query × 6-pass bench session is
      // ~1700 executions of large plans: measured at 600 executions the
      // retention holds ~90 MB of dead bookkeeping (work/aging_ab_r15
      // .json — post-GC heap 335 MB default vs 242 MB trimmed, probe
      // inflation itself ≤2% and GC-revertible). Nothing reads the store
      // here, so retain a diagnostic floor, not a museum.
      .config("spark.sql.ui.retainedExecutions", "30")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "2000")

  /** S3A connector config for the staging reads (SURVEY §2.1 S1/S2's real
    * source — the reference COPYs from `s3://udacity-dend/...`,
    * sql_queries.py:121-128, credentials from dwh.cfg). Every source here
    * goes through the Hadoop FileSystem API, so the SAME JsonSource /
    * `spark.read` code serves S3 by swapping the path scheme to
    * `s3a://bucket/...` and applying this config — no engine change.
    * With no static keys the provider chain (IAM role / env / instance
    * profile) authenticates, the production default; explicit keys and a
    * custom endpoint cover the dwh.cfg-style static case and S3-compatible
    * stores. Untestable in this sandbox (zero egress — the JdbcSink/Derby
    * rule): EtlSemanticsSpec pins the conf mapping itself, and
    * JsonSourceSpec pins scheme-agnostic reads via fully-qualified
    * `file://` URIs through the same FileSystem layer. */
  private[graft] def s3aConf(accessKey: Option[String] = None,
                             secretKey: Option[String] = None,
                             endpoint: Option[String] = None,
                             pathStyleAccess: Boolean = false): Map[String, String] =
    Map("spark.hadoop.fs.s3a.impl" ->
        "org.apache.hadoop.fs.s3a.S3AFileSystem") ++
      accessKey.map("spark.hadoop.fs.s3a.access.key" -> _) ++
      secretKey.map("spark.hadoop.fs.s3a.secret.key" -> _) ++
      endpoint.map("spark.hadoop.fs.s3a.endpoint" -> _) ++
      (if (pathStyleAccess)
        Map("spark.hadoop.fs.s3a.path.style.access" -> "true")
      else Map.empty)

  /** Apply [[s3aConf]] to a session builder:
    * {{{
    * val spark = GraftSession.withS3a(
    *   GraftSession.builder("yarn", 1024),
    *   endpoint = Some("s3.eu-west-1.amazonaws.com")).getOrCreate()
    * spark.read.schema(Schemas.stagingEvents)
    *   .json("s3a://udacity-dend/log_data")   // the reference's staging read
    * }}} */
  def withS3a(b: SparkSession.Builder,
              accessKey: Option[String] = None,
              secretKey: Option[String] = None,
              endpoint: Option[String] = None,
              pathStyleAccess: Boolean = false): SparkSession.Builder =
    s3aConf(accessKey, secretKey, endpoint, pathStyleAccess)
      .foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
