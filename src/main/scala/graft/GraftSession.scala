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
      // NOTE: `canChangeCachedPlanOutputPartitioning` stays at Spark's
      // default here. The keyed graph loops — the only plans that need a
      // persisted edge list to KEEP its hash(src,np) partitioning across
      // rounds — pin it via GraphQueries.withPinnedCachedPartitioning
      // (scoped set/restore); session-wide the pin costs every OTHER
      // cache-heavy query the AQE re-plan it wants (round-10 bench:
      // q84/q82/q79/q81 regressions, adjudicated in work/ab_cached_replan).
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      // Pinned: the default derives from the process cwd, and managed
      // tables (bucketed joins) must land inside the repo regardless of
      // where the harness launches us.
      .config("spark.sql.warehouse.dir", "/root/repo/work/warehouse")
      .config("spark.ui.enabled", "false")
}
