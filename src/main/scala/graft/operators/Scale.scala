package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale patterns that only matter past a single node: skew-salted
  * aggregation and bucketed (co-located) joins.
  *
  * These are the Spark analogs of the reference's physical layout hints —
  * `diststyle even` spreads a skewless fact, but nothing in Redshift or
  * Spark saves a shuffle whose key histogram is pathological; salting does.
  * Bucketing is the `diststyle key` the reference never needed (its dims
  * were `all`-replicated) but a 100 TB fact-to-fact join does.
  */
object Scale {

  /** Two-stage salted aggregation for skewed group keys.
    *
    * Stage 1 groups on (key, salt) — a hot key's rows land on `salts`
    * different reducers instead of one; stage 2 merges the partials per
    * key. Both stages are algebraic (count/sum), so the result is exactly
    * the direct aggregation's. The salt is derived from a uniform column
    * (not `rand()`) to keep the plan deterministic and retry-safe.
    *
    * Note Spark's map-side partial aggregation already handles *moderate*
    * skew; explicit salting is for the regime where even one reducer's
    * share of a single key exceeds executor memory — at 100 TB with a
    * 5-value key column, that is the default regime, not the exception. */
  def saltedAgg(df: DataFrame, key: Column, saltSource: Column, salts: Int)(
      aggs: (String, Column)*): DataFrame = {
    val stage1 = df
      .groupBy(key.as("k"), pmod(xxhash64(saltSource), lit(salts)).as("salt"))
      .agg(aggs.head._2.as(s"p_${aggs.head._1}"),
        aggs.tail.map { case (n, c) => c.as(s"p_$n") }: _*)
    val merged = aggs.map { case (n, _) => sum(col(s"p_$n")).as(n) }
    stage1.groupBy(col("k")).agg(merged.head, merged.tail: _*)
  }

  /** Salted skew JOIN — the join-shaped twin of [[saltedAgg]], for the
    * regime where the probe side's key histogram is pathological AND the
    * build side is too big to broadcast (a broadcast absorbs skew for
    * free — salting only earns its keep past that size). The build side
    * replicates `salts`× via an in-scan generator (rows materialize at the
    * shuffle, never on the driver); the probe side computes its salt from
    * a uniform column; the join keys become (key, salt), so a hot key's
    * probe rows spread over `salts` reducers instead of drowning one.
    * The salt columns drop before returning — results are exactly the
    * plain join's (the oracle gates that). AQE's skew split handles
    * moderate skew reactively; explicit salting is the plan-stable form
    * for known-pathological keys. Forced to a merge join so the physical
    * shape under test cannot silently degrade to a broadcast. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      probeSaltSource: Column, salts: Int): DataFrame = {
    val saltedProbe = probe.withColumn("_salt",
      pmod(xxhash64(probeSaltSource), lit(salts.toLong)))
    val saltedBuild = build.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    saltedProbe.hint("merge")
      .join(saltedBuild, Seq(key, "_salt"))
      .drop("_salt")
  }

  /** Write both sides of a join bucketed on the join key (same bucket
    * count) into the session catalog — subsequent joins on that key are
    * exchange-free: each task reads matching buckets from both tables
    * (`diststyle key` co-location). Sort-by makes the merge join's sort a
    * no-op per bucket file.
    *
    * Idempotent like a real `CREATE TABLE … diststyle key`: callers tag the
    * table name with the data's identity (e.g. scale dir), and a build is
    * skipped when that table's bucketed files are already on disk — a fresh
    * session re-registers the metadata over the existing files instead of
    * rewriting them (bucket once, join many).
    *
    * `dataFingerprint` ties the layout to the INPUT data's identity (e.g.
    * [[dirFingerprint]] of the source dir): if the source parquet is ever
    * regenerated in place, the spec no longer matches and the bucketed
    * copy is rebuilt instead of silently serving stale rows. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      dataFingerprint: String = ""): Unit = {
    val spark = df.sparkSession
    val loc = java.nio.file.Paths.get(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, table)
    // The on-disk layout is only reusable if it was written with THIS exact
    // spec — schema, key, and bucket count. A signature file next to
    // _SUCCESS records the spec; any mismatch (changed bucket count,
    // changed projection) forces a rebuild instead of silently attaching
    // new metadata to an old physical layout. `1fpb` tags the one-file-
    // per-bucket layout (below) so layouts written before it rebuild.
    val spec = s"${df.schema.toDDL}|$key|$buckets|1fpb|$dataFingerprint"
    val specFile = loc.resolve("_graft_bucket_spec")
    val intact = java.nio.file.Files.exists(loc.resolve("_SUCCESS")) &&
      java.nio.file.Files.exists(specFile) &&
      new String(java.nio.file.Files.readAllBytes(specFile), "UTF-8") == spec
    if (spark.catalog.tableExists(table) && intact) return
    spark.sql(s"DROP TABLE IF EXISTS $table")
    if (intact) {
      // Files survive from a previous session; only the in-memory catalog
      // forgot them. Re-attach the bucketing metadata over the same location.
      spark.sql(
        s"""CREATE TABLE $table (${df.schema.toDDL}) USING PARQUET
           |CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
           |LOCATION '${loc.toUri}'""".stripMargin)
      return
    }
    deleteRecursively(loc)
    // ONE FILE PER BUCKET: a reader may only treat a bucket as sorted when
    // the bucket is a single file — with the default many-writer layout
    // (each task emits its own file per bucket) every bucketed merge join
    // re-sorts both sides, defeating half the layout. repartition on the
    // bucket key with numPartitions = buckets uses the same Murmur3
    // hash-mod the bucket assignment uses, so each write task holds
    // exactly one bucket and sortBy yields a genuinely sorted bucket the
    // join consumes sort-free (PlanSpec pins zero Sort under q29's join).
    df.repartition(buckets, col(key)).write.bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").saveAsTable(table)
    java.nio.file.Files.write(specFile, spec.getBytes("UTF-8"))
  }

  /** Plain write-once CATALOG table — [[writeBucketed]] without the bucket
    * layout: the same spec-file gating and fresh-session re-attach, but
    * registered flat. Exists for the metadata surface a path scan cannot
    * offer: `ANALYZE TABLE` persists row/column statistics into the
    * catalog entry, which is what stats-driven planning (q239) consumes.
    * Data identity discipline is identical — a regenerated source parquet
    * flips the fingerprint and forces a rebuild. */
  def writeTable(df: DataFrame, table: String, dataFingerprint: String = ""): Unit = {
    val spark = df.sparkSession
    val loc = java.nio.file.Paths.get(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, table)
    val spec = s"${df.schema.toDDL}|$dataFingerprint"
    val specFile = loc.resolve("_graft_table_spec")
    val intact = java.nio.file.Files.exists(loc.resolve("_SUCCESS")) &&
      java.nio.file.Files.exists(specFile) &&
      new String(java.nio.file.Files.readAllBytes(specFile), "UTF-8") == spec
    if (spark.catalog.tableExists(table) && intact) return
    spark.sql(s"DROP TABLE IF EXISTS $table")
    if (intact) {
      spark.sql(
        s"""CREATE TABLE $table (${df.schema.toDDL}) USING PARQUET
           |LOCATION '${loc.toUri}'""".stripMargin)
      return
    }
    deleteRecursively(loc)
    df.write.mode("overwrite").saveAsTable(table)
    java.nio.file.Files.write(specFile, spec.getBytes("UTF-8"))
  }

  /** Idempotent `ANALYZE TABLE … COMPUTE STATISTICS FOR COLUMNS …`: a scan
    * of the table per SESSION at most (the in-memory catalog forgets stats
    * with the session; within one it is a metadata no-op when row stats
    * and every requested column's stats are already present). This is the
    * Spark analog of Redshift's auto-ANALYZE feeding its planner — the
    * role SURVEY §4 assigns to Catalyst, made explicit here so a plan can
    * legitimately DEPEND on statistics (q239's broadcast decision). */
  def ensureAnalyzed(spark: org.apache.spark.sql.SparkSession, table: String,
      cols: Seq[String]): Unit = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val have = meta.stats.exists(st =>
      st.rowCount.isDefined && cols.forall(st.colStats.contains))
    if (!have)
      spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR COLUMNS " +
        cols.mkString(", "))
  }

  /** The catalog's total-size statistic for an analyzed table (file bytes
    * — what the planner's size estimate starts from). */
  def tableSizeInBytes(spark: org.apache.spark.sql.SparkSession,
      table: String): BigInt =
    spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
      .stats.map(_.sizeInBytes)
      .getOrElse(throw new IllegalStateException(s"$table has no stats"))

  /** Hive-style partitioned write (write-once, like [[writeBucketed]]):
    * lays the DataFrame out as `<warehouse>/<table>/<partKey>=<value>/...`
    * so a reader's partition-key predicate prunes whole directories at
    * planning time (PartitionFilters) — the Spark analog of the date/tenant
    * partition layout every 100 TB corpus uses to avoid full scans. Returns
    * the directory to read back. Same spec-file gating: schema, key, or
    * data-fingerprint drift forces a rebuild, a fresh session over intact
    * files skips it. */
  def writePartitioned(df: DataFrame, table: String, partKey: String,
      dataFingerprint: String = ""): String = {
    val spark = df.sparkSession
    val loc = java.nio.file.Paths.get(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, table)
    val spec = s"${df.schema.toDDL}|$partKey|$dataFingerprint"
    val specFile = loc.resolve("_graft_part_spec")
    val intact = java.nio.file.Files.exists(loc.resolve("_SUCCESS")) &&
      java.nio.file.Files.exists(specFile) &&
      new String(java.nio.file.Files.readAllBytes(specFile), "UTF-8") == spec
    if (!intact) {
      deleteRecursively(loc)
      df.write.partitionBy(partKey).mode("overwrite").parquet(loc.toString)
      java.nio.file.Files.write(specFile, spec.getBytes("UTF-8"))
    }
    loc.toString
  }

  /** Small-files compaction (write-once): rewrite a table into
    * ~`targetBytes`-sized files, with the file count derived from
    * Catalyst's size ESTIMATE (`optimizedPlan.stats.sizeInBytes` — file
    * sizes scaled by the pruned-schema defaultSize ratio, so it is
    * directionally right but can miss actual bytes by a wide factor on
    * string-heavy schemas; right-sizing to compressed output bytes needs
    * a post-write pass or table statistics). The classic
    * layout-maintenance pass: a 100 TB table accreted from thousands of
    * micro-batches reads far slower through a million tiny files
    * (task-per-file scheduling, footer overhead) than through right-sized
    * ones; conversely one giant file caps scan parallelism.
    * `repartition(n)` (round-robin) balances output sizes; the write is
    * gated through [[writeOnce]]. Returns the dir. */
  def compact(df: DataFrame, table: String, targetBytes: Long,
      dataFingerprint: String = ""): String = {
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // Clamp before toInt: a stats fallback (defaultSizeInBytes can be
    // Long.MaxValue) must degrade to "many partitions", never wrap through
    // BigInt.toInt into a garbage (or 1-file) count.
    val n = ((estBytes + targetBytes - 1) / targetBytes)
      .min(BigInt(1 << 20)).toInt.max(1)
    writeOnce(df.repartition(n), table, s"compact=$targetBytes|$dataFingerprint")
  }

  /** Plain write-once materialization (parquet by default; `format` opens
    * it to Spark's other native columnar/row formats, e.g. "orc" for the
    * q237 ingest-matrix entry): rewrite only when the spec (schema +
    * format + caller-supplied identity, e.g. a [[dirFingerprint]]) does
    * not match what is on disk. The minimal member of the write-once
    * family ([[writeBucketed]]/[[writePartitioned]]/[[compact]] add their
    * layout knobs to the spec). A non-parquet format joins the spec
    * string (a format flip must rebuild, not serve the old bytes);
    * parquet keeps the legacy spec form so existing layouts stay intact.
    * Returns the dir. */
  def writeOnce(df: DataFrame, table: String, dataFingerprint: String,
      format: String = "parquet"): String = {
    val spark = df.sparkSession
    val loc = java.nio.file.Paths.get(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, table)
    val fmtKey = if (format == "parquet") "" else s"format=$format|"
    val spec = s"${df.schema.toDDL}|$fmtKey$dataFingerprint"
    val specFile = loc.resolve("_graft_spec")
    val intact = java.nio.file.Files.exists(loc.resolve("_SUCCESS")) &&
      java.nio.file.Files.exists(specFile) &&
      new String(java.nio.file.Files.readAllBytes(specFile), "UTF-8") == spec
    if (!intact) {
      deleteRecursively(loc)
      df.write.mode("overwrite").format(format).save(loc.toString)
      java.nio.file.Files.write(specFile, spec.getBytes("UTF-8"))
    }
    loc.toString
  }

  /** A WAP publish refused: every failed audit by name. The job fails
    * loudly and the PREVIOUS published version stays current. */
  final case class AuditFailure(table: String, failed: Seq[String])
    extends RuntimeException(
      s"WAP audit failed for $table: ${failed.mkString(", ")}")

  /** Write-Audit-Publish: the lakehouse promotion protocol. The candidate
    * materializes into an UNPUBLISHED version directory, the audits run
    * against the STAGED BYTES (what readers would actually see — auditing
    * the input DataFrame would re-plan and could pass while the files are
    * wrong), and only a full pass moves the `_graft_current` pointer —
    * via temp-file + ATOMIC_MOVE, so a concurrent reader resolves
    * old-version-or-new-version, never a partial write (the snapshot-
    * pointer mechanics behind Iceberg/Delta commits, reduced to one
    * pointer file). A failed audit throws [[AuditFailure]], deletes the
    * candidate, and leaves the previous version published — bad data can
    * not become visible, which is the entire point.
    *
    * Version identity is the write-once spec (schema + caller
    * fingerprint): an unchanged spec re-publish is a no-op reuse, the
    * bench-purge discipline applies unchanged. Returns the CURRENT
    * version's data directory. */
  def writeAuditPublish(df: DataFrame, table: String, dataFingerprint: String,
      audits: Seq[(String, DataFrame => Boolean)]): String = {
    val spark = df.sparkSession
    val root = java.nio.file.Paths.get(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, table)
    val spec = s"${df.schema.toDDL}|$dataFingerprint"
    val ver = {
      val md = java.security.MessageDigest.getInstance("MD5")
      "v_" + md.digest(spec.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(12)
    }
    val pointer = root.resolve("_graft_current")
    val verDir = root.resolve(ver)
    val current =
      if (java.nio.file.Files.exists(pointer))
        new String(java.nio.file.Files.readAllBytes(pointer), "UTF-8")
      else ""
    val intact = current == ver &&
      java.nio.file.Files.exists(verDir.resolve("_SUCCESS"))
    if (!intact) {
      val staging = root.resolve(s"${ver}__staging")
      deleteRecursively(staging)
      deleteRecursively(verDir)
      df.write.mode("overwrite").parquet(staging.toString)
      val staged = spark.read.parquet(staging.toString)
      val failed = audits.collect { case (name, check) if !check(staged) => name }
      if (failed.nonEmpty) {
        deleteRecursively(staging) // no unpublished corpse to confuse anyone
        throw AuditFailure(table, failed)
      }
      java.nio.file.Files.move(staging, verDir,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      val tmp = root.resolve("_graft_current__tmp")
      java.nio.file.Files.write(tmp, ver.getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, pointer,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // previous versions are now unreachable — reclaim them
      java.nio.file.Files.list(root).forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith("v_") && n != ver) deleteRecursively(p)
      }
    }
    verDir.toString
  }

  /** Versioned publish with RETENTION — [[writeAuditPublish]]'s single
    * pointer generalized to an ordered version LOG (`_graft_log`, oldest →
    * newest, rewritten by temp-file + ATOMIC_MOVE), keeping the newest
    * `keep` versions' directories on disk. This is what turns a snapshot
    * store into a TIME-TRAVELABLE one: yesterday's corpus stays readable
    * (as-of reads, version diffs, incident rollback) until retention
    * prunes it — the Iceberg/Delta snapshot-log + expire-snapshots pair,
    * reduced to one log file and version directories.
    *
    * Version identity is the write-once spec (schema + caller
    * fingerprint): re-publishing content whose version is already retained
    * is a no-op reuse — idempotent daily pipelines re-publish their whole
    * history every run and the log neither grows nor reorders. A NEW
    * version appends, then directories that fell off the retained tail are
    * reclaimed. Publishing never touches retained older versions' files
    * (OperationalSpec pins byte-identity across a publish). */
  def publishRetained(df: DataFrame, table: String, dataFingerprint: String,
      keep: Int): String = {
    require(keep >= 1, s"publishRetained keep must be >= 1 (got $keep)")
    val spark = df.sparkSession
    val root = java.nio.file.Paths.get(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, table)
    java.nio.file.Files.createDirectories(root)
    val spec = s"${df.schema.toDDL}|$dataFingerprint"
    val ver = {
      val md = java.security.MessageDigest.getInstance("MD5")
      "v_" + md.digest(spec.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(12)
    }
    val verDir = root.resolve(ver)
    val log0 = readLog(root)
    val intact = log0.contains(ver) &&
      java.nio.file.Files.exists(verDir.resolve("_SUCCESS"))
    if (!intact) {
      val staging = root.resolve(s"${ver}__staging")
      deleteRecursively(staging)
      deleteRecursively(verDir)
      df.write.mode("overwrite").parquet(staging.toString)
      java.nio.file.Files.move(staging, verDir,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      val log1 = (log0.filterNot(_ == ver) :+ ver).takeRight(keep)
      val tmp = root.resolve("_graft_log__tmp")
      java.nio.file.Files.write(tmp, log1.mkString("\n").getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, root.resolve("_graft_log"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      java.nio.file.Files.list(root).forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith("v_") && !log1.contains(n)) deleteRecursively(p)
      }
    }
    root.toString
  }

  private def readLog(root: java.nio.file.Path): Seq[String] = {
    val logFile = root.resolve("_graft_log")
    if (java.nio.file.Files.exists(logFile))
      new String(java.nio.file.Files.readAllBytes(logFile), "UTF-8")
        .split("\n").toSeq.filter(_.nonEmpty)
    else Seq.empty
  }

  /** Time-travel read: the version `ago` steps back from the newest
    * retained one (0 = current). Throws if retention has already pruned
    * that far back — time travel is bounded by `keep`, by design. */
  def readVersionAgo(spark: org.apache.spark.sql.SparkSession, table: String,
      ago: Int): DataFrame = {
    val root = java.nio.file.Paths.get(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, table)
    val log = readLog(root)
    require(ago >= 0 && ago < log.size,
      s"version $ago steps back is not retained (log has ${log.size} versions)")
    spark.read.parquet(root.resolve(log(log.size - 1 - ago)).toString)
  }

  /** Z-order (Morton) interleave of two non-negative int columns, `bits`
    * bits each → one long sort key. Sorting by z clusters rows that are
    * close in BOTH dimensions into the same parquet row groups, so
    * min/max row-group statistics prune selective 2-D range scans that a
    * single-column sort order cannot — the lakehouse OPTIMIZE ZORDER
    * technique, as a pure column expression (16 shift/mask terms per
    * dimension, codegen'd; identical integer math in the oracle).
    * `bits` ≤ 31 (bit 2·31+1 = 63 would reach the sign bit and break the
    * sort order); coordinate bits above `bits` are TRUNCATED — callers
    * must pick `bits` covering their coordinate domain. */
  def zOrder2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31,
      s"zOrder2 bits must be in [1,31] (got $bits): bit 2*bits+1 must stay below the sign bit")
    (0 until bits).map { i =>
      (shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)): Column
    }.reduce(_ + _)
  }

  /** The same interleave in DuckDB SQL over expressions `a`/`b`. */
  def zOrder2Sql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"(((($a) >> $i) & 1) << ${2 * i}) + (((($b) >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** HILBERT curve index of a 2-D point — the space-filling curve whose
    * consecutive cells are always MANHATTAN-ADJACENT (proved exhaustively
    * in OperationalSpec), which Z-order's diagonal jumps are not: runs of
    * h-sorted rows cover tighter 2-D rectangles, so row-group min/max
    * stats prune better for the same 2-D range probes. Classic iterative
    * xy→d transform (Warren, Hacker's Delight §16; the quadrant-rotation
    * recurrence): per level, the quadrant index pays s²·((3·rx) xor ry)
    * and the lower bits are rotated/reflected into the quadrant's frame.
    *
    * Implemented as a FOLD over the level array with built-ins only
    * (`aggregate` + struct accumulator): sequential state rules out the
    * zOrder2-style flat sum, and a fold keeps the expression tree LINEAR
    * in `bits` where naive per-level substitution would grow 3^bits
    * nodes. Pure integer arithmetic on non-negatives — deterministic
    * everywhere, replayed by the oracle as an unrolled CTE chain
    * ([[hilbert2Ctes]]) and by [[hilbert2Jvm]] for spec ground truth.
    * Coordinates are truncated to `bits` bits, matching zOrder2's
    * contract; d < 4^bits so bits ≤ 31 stays in BIGINT. */
  def hilbert2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"hilbert2 bits must be in [1,31] (got $bits)")
    val mask = lit((1L << bits) - 1)
    val svals = array((0 until bits).reverse.map(l => lit(1L << l)): _*)
    aggregate(
      svals,
      struct(a.cast(org.apache.spark.sql.types.LongType).bitwiseAND(mask).as("x"),
        b.cast(org.apache.spark.sql.types.LongType).bitwiseAND(mask).as("y"),
        lit(0L).as("d")),
      (acc, s) => {
        // the reflection uses the FULL grid size n−1, not s−1: that is
        // the variant whose intermediates stay in [0, n) — and therefore
        // the only one whose //-and-% replay is engine-independent
        // (C-style % on a negative coordinate diverges from floor-%)
        val n1 = lit((1L << bits) - 1)
        val x = acc.getField("x"); val y = acc.getField("y")
        val rx = when(x.bitwiseAND(s) === 0L, 0L).otherwise(1L)
        val ry = when(y.bitwiseAND(s) === 0L, 0L).otherwise(1L)
        struct(
          when(ry === 1L, x).when(rx === 1L, n1 - y).otherwise(y).as("x"),
          when(ry === 1L, y).when(rx === 1L, n1 - x).otherwise(x).as("y"),
          (acc.getField("d") + s * s *
            (rx * (lit(3L) - ry) + (lit(1L) - rx) * ry)).as("d"))
      },
      acc => acc.getField("d"))
  }

  /** Native-or-fold dispatch for [[hilbert2]] (the cosineFnFor
    * discipline): sessions carrying GraftExtensions get the fused codegen
    * loop ([[graft.functions.HilbertIndexExpr]]); vanilla sessions take
    * the built-ins fold — bit-identical either way (FallbackSpec). */
  def hilbert2For(s: org.apache.spark.sql.SparkSession)(
      a: Column, b: Column, bits: Int = 16): Column =
    if (s.catalog.functionExists("hilbert2"))
      call_function("hilbert2",
        a.cast(org.apache.spark.sql.types.LongType),
        b.cast(org.apache.spark.sql.types.LongType), lit(bits))
    else hilbert2(a, b, bits)

  /** JVM twin of [[hilbert2]] — spec-side ground truth. */
  def hilbert2Jvm(a: Long, b: Long, bits: Int): Long = {
    val n1 = (1L << bits) - 1
    var x = a & n1; var y = b & n1
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n1 - x; y = n1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** The same transform as an unrolled DuckDB CTE chain: `baseCte` must
    * yield columns `x0`, `y0` (non-negative, already truncated) plus any
    * pass-through columns; the returned text appends one CTE per level
    * and ends with a `SELECT *` exposing `h`. A single nested expression
    * would grow 3^bits nodes — the chain stays linear, like the fold. */
  def hilbert2Ctes(baseCte: String, bits: Int = 16): String = {
    val levels = (0 until bits).map { i =>
      val s = 1L << (bits - 1 - i)
      val (px, py, pd) = (s"x$i", s"y$i", if (i == 0) "CAST(0 AS BIGINT)" else s"d$i")
      val rx = s"(($px // $s) % 2)"
      val ry = s"(($py // $s) % 2)"
      val n1 = (1L << bits) - 1
      s"""h${i + 1} AS (SELECT * EXCLUDE ($px, $py${if (i == 0) "" else s", d$i"}),
         |  CASE WHEN $ry = 1 THEN $px
         |       WHEN $rx = 1 THEN $n1 - $py ELSE $py END AS x${i + 1},
         |  CASE WHEN $ry = 1 THEN $py
         |       WHEN $rx = 1 THEN $n1 - $px ELSE $px END AS y${i + 1},
         |  $pd + ${s * s} * ($rx * (3 - $ry) + (1 - $rx) * $ry) AS d${i + 1}
         |  FROM h$i)""".stripMargin
    }
    s"""WITH h0 AS ($baseCte),
       |${levels.mkString(",\n")}
       |SELECT * EXCLUDE (x$bits, y$bits, d$bits), d$bits AS h FROM h$bits""".stripMargin
  }

  /** Recursive local-filesystem delete (children before parents); no-op on
    * a missing path. The one shared copy of the idiom for every write-once
    * layout. */
  def deleteRecursively(loc: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(loc))
      java.nio.file.Files.walk(loc)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.delete(p))

  /** Cheap identity digest of the files under `dirs` (name, size, mtime of
    * each regular file) — driver-side metadata only, no data read. Feed to
    * [[writeBucketed]] so regenerated source data invalidates derived
    * bucketed layouts. */
  def dirFingerprint(dirs: String*): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    dirs.foreach { d =>
      val p = java.nio.file.Paths.get(d)
      if (java.nio.file.Files.exists(p)) {
        val s = java.nio.file.Files.walk(p)
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .sorted()
          .forEach { f =>
            md.update(
              s"${p.relativize(f)}|${java.nio.file.Files.size(f)}|${java.nio.file.Files.getLastModifiedTime(f).toMillis}\n"
                .getBytes("UTF-8"))
          }
        finally s.close()
      }
    }
    md.digest().map("%02x".format(_)).mkString
  }
}
