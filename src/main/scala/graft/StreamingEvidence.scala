package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream

/** Driver-visible streaming evidence — the `work/correctness_keyed.json`
  * pattern applied to the streaming twins (round-11 verdict #4): the spec
  * suite already asserts batch ≡ stream for each twin, but specs are only
  * visible as a green `sbt test`; this main re-runs the four production
  * twins against a REAL scale dir and records per-twin equality hashes in
  * a committed JSON artifact, so a round's evidence chain (correctness
  * gate, bench, keyed-graph hashes, streaming hashes) is auditable from
  * files alone.
  *
  * Twins covered (each compares the streaming result content-hash against
  * the batch operator run on the same input):
  *  1. foreachBatch incremental dedup ([[EventStream.incrementalDedupStream]])
  *     — chopped feed ≡ one-shot [[graft.operators.Dedup.incrementalNearDupPairs]];
  *  1b. foreachBatch spatial grid probe ([[EventStream.spatialProbeStream]])
  *     — chopped point feed ≡ one-shot [[SpatialQueries.probeAgainst]];
  *  2. transformWithState running totals ([[EventStream.runningTotalsTws]],
  *     RocksDB state store) — chopped feed ≡ the batch groupBy aggregate;
  *  3. exactly-once-effective sink ([[EventStream.idempotentBatchWrite]])
  *     — a replayed micro-batch leaves the landed rows equal to the batch
  *     distinct input (no duplicates, no losses);
  *  4. catalog versioned sink (`writeStream.toTable` into `graft_cat`,
  *     [[graft.sources.CatalogStreamingWrite]]) — chopped feed lands as
  *     stream-epoch versions equal to the batch input, and a replayed
  *     epoch commit moves neither the version nor the rows;
  *  5. change data feed fold (readStream over a `graft_cat` table's
  *     `.changes` metadata table) — folding the streamed insert/delete
  *     rows reproduces the mutated table exactly (q280's twin).
  *
  * Usage: `runMain graft.StreamingEvidence [sfDir] [outFile]`
  * (defaults: /root/testdata/sf0.01, work/streaming_r13.json). Exit 1 if
  * any twin fails — evidence of a failure must never look like evidence.
  */
object StreamingEvidence {

  private def md5(lines: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    lines.sorted.foreach(l => md.update((l + "\n").getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  /** `unit` names what the two counts COUNT ("rows" for twins whose
    * compared collections are row sets, "keys" when the comparison is over
    * per-key final states — twin 2 groups Update-mode emissions by key, so
    * both sides are key counts); the JSON field names carry the unit so
    * the artifact can never mislabel a key count as a row count. */
  final case class TwinResult(name: String, unit: String, nStream: Long,
      nBatch: Long, streamMd5: String, batchMd5: String, chops: Int) {
    def pass: Boolean = streamMd5 == batchMd5 && nStream == nBatch
    def json: String =
      s"""{"name":"$name","${unit}_stream":$nStream,"${unit}_batch":$nBatch,""" +
        s""""stream_md5":"$streamMd5","batch_md5":"$batchMd5",""" +
        s""""chops":$chops,"pass":$pass}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val outFile = if (args.length > 1) args(1) else "work/streaming_r16.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    // ---- twin 1: foreachBatch incremental dedup (q73's streaming twin) ----
    // Probe docs stream in two chops against the static corpus fingerprints;
    // per-document independence makes the union equal the one-shot probe.
    val dedup = {
      val probeMax = 50L
      val corpus = Tables.documents(spark, sfDir)
        .filter(col("doc_id") >= probeMax).repartition(col("doc_id"))
      val sh = graft.operators.Dedup.shingleSets(corpus, 3)
      val bands = graft.operators.Dedup.bandKeys(sh, 32, 4)
      val probeDocs = Tables.documents(spark, sfDir)
        .filter(col("doc_id") < probeMax)
        .select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val (feedA, feedB) = probeDocs.partition(_._1 < probeMax / 2)

      val input = MemoryStream[(Long, String)]
      val buf = collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      val q = EventStream.incrementalDedupStream(
          input.toDF().toDF("doc_id", "text"), bands, sh, 0.8) { (df, _) =>
          buf ++= df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        }.start()
      try {
        input.addData(feedA.toSeq); q.processAllAvailable()
        input.addData(feedB.toSeq); q.processAllAvailable()
      } finally q.stop()

      val oneShot = graft.operators.Dedup.incrementalNearDupPairs(
          bands, sh,
          Tables.documents(spark, sfDir).filter(col("doc_id") < probeMax), 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      def fmt(t: (Long, Long, Double)) = f"${t._1}%d|${t._2}%d|${t._3}%.9f"
      TwinResult("incremental_dedup_foreachbatch", unit = "rows",
        buf.size.toLong, oneShot.length.toLong,
        md5(buf.toSeq.map(fmt)), md5(oneShot.toSeq.map(fmt)), chops = 2)
    }

    // ---- twin 1b: foreachBatch spatial grid probe (q251's streaming twin) ----
    // Supplier points stream in two chops against the static celled customer
    // corpus; per-probe independence makes the union equal the one-shot probe.
    val spatial = {
      val corpus = SpatialQueries.points(
        Tables.customer(spark, sfDir), "c_custkey")
      val probePts = SpatialQueries.points(
          Tables.supplier(spark, sfDir), "s_suppkey", "s")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val (feedA, feedB) = probePts.partition(_._1 % 2 == 0)
      val (cell, r2) = (8192L, 25000000L) // radius 5000 ≤ cell

      val input = MemoryStream[(Long, Long, Long)]
      val buf = collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      val q = EventStream.spatialProbeStream(
          input.toDF().toDF("id", "x", "y"), corpus, cell, r2) { (df, _) =>
          buf ++= df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        }.start()
      try {
        input.addData(feedA.toSeq); q.processAllAvailable()
        input.addData(feedB.toSeq); q.processAllAvailable()
      } finally q.stop()

      val oneShot = SpatialQueries.probeAgainst(corpus,
          SpatialQueries.points(Tables.supplier(spark, sfDir), "s_suppkey", "s"),
          cell, r2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      def fmt(t: (Long, Long, Long)) = s"${t._1}|${t._2}|${t._3}"
      TwinResult("spatial_probe_foreachbatch", unit = "rows",
        buf.size.toLong, oneShot.length.toLong,
        md5(buf.toSeq.map(fmt)), md5(oneShot.toSeq.map(fmt)), chops = 2)
    }

    // ---- twin 1c: foreachBatch as-of probe (q256's streaming twin) ----
    // Purchases stream in two chops against the static deduped click book;
    // per-left-row independence against a static right side makes the
    // union equal the one-shot native as-of join.
    val asof = {
      val ev = Tables.events(spark, sfDir)
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("click_id"),
          max_by(col("value"), col("event_id")).as("click_value"))
        .select(col("user_id").as("click_user"), col("ts").as("click_ts"),
          col("click_id"), col("click_value"))
        .localCheckpoint(true)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("purchase_ts"))
      val rows = purchases.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
      val (feedA, feedB) = rows.partition(_._1 % 2 == 0)

      val input = MemoryStream[(Long, Long, java.sql.Timestamp)]
      val buf = collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val q = EventStream.asofProbeStream(
          input.toDF().toDF("purchase_id", "user_id", "purchase_ts"), clicks,
          "user_id", "purchase_ts", "click_user", "click_ts") { (df, _) =>
          buf ++= df.collect().map(r =>
            (r.getLong(0), if (r.isNullAt(5)) -1L else r.getLong(5)))
        }.start()
      try {
        input.addData(feedA.toSeq); q.processAllAvailable()
        input.addData(feedB.toSeq); q.processAllAvailable()
      } finally q.stop()

      val oneShot = graft.operators.Asof.asofJoin(purchases, clicks,
          "user_id", "purchase_ts", "click_user", "click_ts")
        .collect().map(r =>
          (r.getLong(0), if (r.isNullAt(5)) -1L else r.getLong(5)))
      def fmt(t: (Long, Long)) = s"${t._1}|${t._2}"
      TwinResult("asof_probe_foreachbatch", unit = "rows",
        buf.size.toLong, oneShot.length.toLong,
        md5(buf.toSeq.map(fmt)), md5(oneShot.toSeq.map(fmt)), chops = 2)
    }

    // ---- twin 2: transformWithState running totals (RocksDB store) ----
    // The full events table as TypedEvents, chopped into three micro-batches;
    // final per-key totals must equal the batch aggregate bit-for-bit.
    val tws = {
      // SessionConf.withValue, not a hand-rolled set/restore: the scoped
      // form serializes with any concurrent conf scope on this session
      val confKey = "spark.sql.streaming.stateStore.providerClass"
      SessionConf.withValue(spark, confKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
        val feed = Tables.events(spark, sfDir)
          .filter(col("value").isNotNull)
          .select(col("event_type"),
            (col("value") * 100).cast("long").as("cents"))
          .collect()
          .map(r => EventStream.TypedEvent(r.getString(0), r.getLong(1)))
        val chunks = feed.grouped(math.max(1, feed.length / 3 + 1)).toSeq

        val input = MemoryStream[EventStream.TypedEvent]
        val qn = "streaming_evidence_tws"
        val q = EventStream.runningTotalsTws(input.toDS())
          .writeStream.format("memory").queryName(qn)
          .outputMode(OutputMode.Update()).start()
        try chunks.foreach { ch => input.addData(ch.toSeq: _*); q.processAllAvailable() }
        finally q.stop()
        // Update mode emits one row per touched key per batch; the running
        // count is monotone, so the final total per key is its max-n row.
        val streamed = spark.table(qn).collect()
          .map(r => (r.getAs[String]("event_type"),
            (r.getAs[Long]("n"), r.getAs[Long]("cents"))))
          .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).maxBy(_._1)) }

        val batch = Tables.events(spark, sfDir)
          .filter(col("value").isNotNull)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum((col("value") * 100).cast("long")).as("cents"))
          .collect()
          .map(r => (r.getAs[String]("event_type"),
            (r.getAs[Long]("n"), r.getAs[Long]("cents")))).toMap
        def fmt(kv: (String, (Long, Long))) = s"${kv._1}|${kv._2._1}|${kv._2._2}"
        TwinResult("transform_with_state_running_totals", unit = "keys",
          streamed.size.toLong, batch.size.toLong,
          md5(streamed.toSeq.map(fmt)), md5(batch.toSeq.map(fmt)),
          chops = chunks.length)
      }
    }

    // ---- twin 3: exactly-once-effective foreachBatch sink ----
    // A 3-chop event slice streams through the sink, then micro-batch 0 is
    // REPLAYED (the at-least-once delivery case); landed rows must equal
    // the batch input exactly — no duplicates, no losses.
    val eos = {
      val dir = java.nio.file.Files.createTempDirectory("graft-eos-evidence").toString
      try {
      val slice = Tables.events(spark, sfDir)
        .filter(col("event_id") < 3000)
        .select(col("event_id"), col("event_type")).collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val chunks = slice.grouped(1000).toSeq

      val input = MemoryStream[(Long, String)]
      var firstBatchId = -1L
      var firstBatchRows: Array[org.apache.spark.sql.Row] = Array.empty
      val q = input.toDF().toDF("event_id", "event_type").writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          if (firstBatchId < 0) { firstBatchId = id; firstBatchRows = df.collect() }
          EventStream.idempotentBatchWrite(dir)(df, id)
        }.start()
      try chunks.foreach { ch => input.addData(ch.toSeq: _*); q.processAllAvailable() }
      finally q.stop()
      // the replay: the same first batch content is delivered again
      EventStream.idempotentBatchWrite(dir)(
        spark.createDataFrame(
          java.util.Arrays.asList(firstBatchRows: _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("event_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("event_type",
              org.apache.spark.sql.types.StringType)))),
        firstBatchId)

      val landed = spark.read.parquet(dir)
        .select(col("event_id"), col("event_type")).collect()
        .map(r => (r.getLong(0), r.getString(1)))
      def fmt(t: (Long, String)) = s"${t._1}|${t._2}"
      TwinResult("exactly_once_effective_sink", unit = "rows",
        landed.length.toLong, slice.length.toLong,
        md5(landed.toSeq.map(fmt)), md5(slice.toSeq.map(fmt)),
        chops = chunks.length)
      } finally graft.operators.Scale.deleteRecursively( // landed rows are
        java.nio.file.Paths.get(dir)) // compared above — the dir is disposable
    }

    // ---- twin 4: catalog versioned sink (epoch-idempotent commits) ----
    // The same 3-chop slice streams through writeStream.toTable into a
    // graft_cat table (each micro-batch one stream-epoch version), then
    // epoch 0 is REPLAYED at the protocol level; landed rows must equal
    // the batch input exactly and the replay must not move the version.
    val cat = {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.db")
      spark.sql("DROP TABLE IF EXISTS graft_cat.db.stream_evidence")
      spark.sql(
        "CREATE TABLE graft_cat.db.stream_evidence (k BIGINT, cents BIGINT)")
      val slice = Tables.events(spark, sfDir)
        .filter(col("value").isNotNull && col("event_id") < 3000)
        .select(col("event_id"), (col("value") * 100).cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val chunks = slice.grouped(1000).toSeq
      val ckpt =
        java.nio.file.Files.createTempDirectory("graft-cat-ckpt").toString
      val input = MemoryStream[(Long, Long)]
      val q = input.toDF().toDF("k", "cents").writeStream
        .option("checkpointLocation", ckpt).outputMode("append")
        .toTable("graft_cat.db.stream_evidence")
      try chunks.foreach { ch =>
        input.addData(ch.toSeq: _*); q.processAllAvailable()
      } finally q.stop()
      val dir = new java.io.File("/root/repo/work/graft_cat/db/stream_evidence")
      val vBefore = graft.sources.GraftTableCatalog.readLatest(dir)
      // a REPLAY is same-query, same-epoch: markers are namespaced
      // <queryId>:<epochId>, so the protocol-level replay reuses the
      // landed stream's queryId (a fresh queryId is correctly a NEW
      // stream and would commit)
      val qid0 = graft.sources.GraftTableCatalog.readManifest(dir, vBefore)
        .epochs.collectFirst { case e if e.endsWith(":0") =>
          e.dropRight(2) }.getOrElse(sys.error("no epoch-0 marker landed"))
      new graft.sources.CatalogStreamingWrite(dir,
        graft.sources.GraftTableCatalog.readSchema(dir), queryId = qid0)
        .commit(0L, Array.empty)
      require(graft.sources.GraftTableCatalog.readLatest(dir) == vBefore,
        "replayed epoch moved the version")
      val landed = spark.sql(
          "SELECT k, cents FROM graft_cat.db.stream_evidence")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      def fmt(t: (Long, Long)) = s"${t._1}|${t._2}"
      TwinResult("catalog_versioned_sink", unit = "rows",
        landed.length.toLong, slice.length.toLong,
        md5(landed.toSeq.map(fmt)), md5(slice.toSeq.map(fmt)),
        chops = chunks.length)
    }

    // ---- twin 6: streaming CDC UPSERT (equality deletes) ----
    // Three overlapping micro-batches stream into an upsert-keyed
    // catalog table (each epoch = data files + a sequence-tagged key
    // file; ZERO data files rewritten); the landed state must equal
    // last-writer-wins computed batch-side, and a protocol-level epoch
    // replay must move neither version nor rows.
    val upsert = {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.db")
      spark.sql("DROP TABLE IF EXISTS graft_cat.db.upsert_evidence")
      spark.sql("""CREATE TABLE graft_cat.db.upsert_evidence
        |(k BIGINT, cents BIGINT)
        |TBLPROPERTIES ('write.upsert.key'='k')""".stripMargin)
      val slice = Tables.events(spark, sfDir)
        .filter(col("value").isNotNull && col("event_id") < 3000)
        .select(col("event_id"), (col("value") * 100).cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // chop 1: k < 2000 raw; chop 2: k in [1000, 3000) with +7;
      // chop 3: k < 500 with +13 — last writer wins per key
      val chops = Seq(
        slice.filter(_._1 < 2000),
        slice.filter(_._1 >= 1000).map { case (k, c) => (k, c + 7) },
        slice.filter(_._1 < 500).map { case (k, c) => (k, c + 13) })
      val expected = slice.map { case (k, c) =>
        if (k < 500) (k, c + 13)
        else if (k >= 1000) (k, c + 7)
        else (k, c)
      }
      val ckpt =
        java.nio.file.Files.createTempDirectory("graft-ups-ckpt").toString
      val input = MemoryStream[(Long, Long)]
      val q = input.toDF().toDF("k", "cents").writeStream
        .option("checkpointLocation", ckpt).outputMode("append")
        .toTable("graft_cat.db.upsert_evidence")
      try chops.foreach { ch =>
        input.addData(ch.toSeq: _*); q.processAllAvailable()
      } finally q.stop()
      val dir = new java.io.File(
        "/root/repo/work/graft_cat/db/upsert_evidence")
      val vBefore = graft.sources.GraftTableCatalog.readLatest(dir)
      val upsQid = graft.sources.GraftTableCatalog.readManifest(dir, vBefore)
        .epochs.collectFirst { case e if e.endsWith(":0") =>
          e.dropRight(2) }.getOrElse(sys.error("no epoch-0 marker landed"))
      new graft.sources.CatalogStreamingWrite(dir,
        graft.sources.GraftTableCatalog.readSchema(dir), queryId = upsQid)
        .commit(0L, Array.empty)
      require(graft.sources.GraftTableCatalog.readLatest(dir) == vBefore,
        "replayed upsert epoch moved the version")
      val landed = spark.sql(
          "SELECT k, cents FROM graft_cat.db.upsert_evidence")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // the change feed resolves the upserts' retractions: folding it
      // must reproduce the landed state exactly
      val foldedOk = spark.sql(
        """WITH folded AS (SELECT k, cents,
          |    sum(CASE WHEN _change_type = 'insert' THEN 1 ELSE -1 END) AS n
          |  FROM graft_cat.db.upsert_evidence.changes
          |  GROUP BY k, cents HAVING n != 0)
          |SELECT (SELECT count(*) FROM folded WHERE n = 1),
          |       (SELECT count(*) FROM folded WHERE n != 1)""".stripMargin)
        .collect().head
      require(foldedOk.getLong(0) == landed.length &&
        foldedOk.getLong(1) == 0L,
        s"CDF fold over the upsert stream diverged: $foldedOk")
      def fmt(t: (Long, Long)) = s"${t._1}|${t._2}"
      TwinResult("streaming_cdc_upsert", unit = "rows",
        landed.length.toLong, expected.length.toLong,
        md5(landed.toSeq.map(fmt)), md5(expected.toSeq.map(fmt)),
        chops = chops.length)
    }

    // ---- twin 5: change data feed — streamed fold ≡ batch state ----
    // A catalog table mutates (two appends, a COW update, a merge-on-read
    // delete, a compaction); readStream over `.changes` folds the
    // insert/delete rows into a driver-side multiset, and the folded
    // state must equal the batch table read EXACTLY — the proof the feed
    // carries the net changes and nothing else (q280's streaming twin).
    val cdf = {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.db")
      spark.sql("DROP TABLE IF EXISTS graft_cat.db.cdf_evidence")
      spark.sql("""CREATE TABLE graft_cat.db.cdf_evidence
        |(k BIGINT, cents BIGINT)
        |TBLPROPERTIES ('delete.mode'='merge-on-read')""".stripMargin)
      val evSql = s"""SELECT event_id AS k,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |FROM parquet.`$sfDir/events.parquet`
        |WHERE value IS NOT NULL AND event_id < 4000""".stripMargin
      spark.sql("INSERT INTO graft_cat.db.cdf_evidence " +
        s"SELECT * FROM ($evSql) t WHERE k % 2 = 0")
      spark.sql("INSERT INTO graft_cat.db.cdf_evidence " +
        s"SELECT * FROM ($evSql) t WHERE k % 2 = 1")
      spark.sql(
        "UPDATE graft_cat.db.cdf_evidence SET cents = cents * 3 WHERE k % 5 = 0")
      spark.sql("DELETE FROM graft_cat.db.cdf_evidence WHERE cents >= 30000")
      spark.sql("CALL graft_cat.sys.compact('db', 'cdf_evidence', " +
        s"${64L * 1024 * 1024})")
      val state = collection.mutable.Map.empty[(Long, Long), Long]
      val ckpt =
        java.nio.file.Files.createTempDirectory("graft-cdf-ckpt").toString
      val q = spark.readStream.table("graft_cat.db.cdf_evidence.changes")
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach { r =>
            val key = (r.getLong(0), r.getLong(1))
            val delta = if (r.getString(2) == "insert") 1L else -1L
            val n = state.getOrElse(key, 0L) + delta
            if (n == 0L) state.remove(key) else state(key) = n
          }
        }.start()
      try q.processAllAvailable() finally q.stop()
      require(state.valuesIterator.forall(_ > 0),
        "CDF fold went negative: a delete without a matching insert")
      val folded = state.toSeq
        .flatMap { case (kv, n) => Seq.fill(n.toInt)(kv) }
      val batch = spark.sql("SELECT k, cents FROM graft_cat.db.cdf_evidence")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val versions = graft.sources.GraftTableCatalog.readLatest(
        new java.io.File("/root/repo/work/graft_cat/db/cdf_evidence"))
      def fmt(t: (Long, Long)) = s"${t._1}|${t._2}"
      TwinResult("change_data_feed_fold", unit = "rows",
        folded.length.toLong, batch.length.toLong,
        md5(folded.map(fmt)), md5(batch.toSeq.map(fmt)),
        chops = versions.toInt)
    }

    // ---- twin 9: incremental materialized aggregate on the change feed ----
    // The q289/q153 IVM pattern under RESTART CHOPS: a rollup (count/sum
    // per group) is maintained from `.changes` deltas ONLY — each
    // micro-batch aggregates its own delta distributively and merges
    // O(groups) rows into driver state; the stream stops and resumes
    // from its checkpoint between every mutation phase. The final state
    // must equal the batch rollup of the mutated table exactly — the
    // proof a downstream materialization can follow a mutating lake
    // table across restarts without ever rescanning it.
    val ivm = {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.db")
      spark.sql("DROP TABLE IF EXISTS graft_cat.db.ivm_evidence")
      spark.sql("""CREATE TABLE graft_cat.db.ivm_evidence
        |(k BIGINT, cents BIGINT)
        |TBLPROPERTIES ('delete.mode'='merge-on-read')""".stripMargin)
      val evSql = s"""SELECT event_id AS k,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |FROM parquet.`$sfDir/events.parquet`
        |WHERE value IS NOT NULL AND event_id < 4000""".stripMargin
      val state = collection.mutable.Map.empty[Long, (Long, Long)]
      val ckpt =
        java.nio.file.Files.createTempDirectory("graft-ivm-ckpt").toString
      def drain(): Unit = {
        val q = spark.readStream.table("graft_cat.db.ivm_evidence.changes")
          .writeStream.option("checkpointLocation", ckpt)
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.selectExpr("k % 9 AS g",
                "CASE WHEN _change_type = 'insert' THEN 1 ELSE -1 END AS sgn",
                "cents")
              .groupBy("g")
              .agg(org.apache.spark.sql.functions.sum("sgn").as("dn"),
                org.apache.spark.sql.functions.expr("sum(sgn * cents)")
                  .as("dc"))
              .collect().foreach { r =>
                val g = r.getLong(0)
                val (n0, c0) = state.getOrElse(g, (0L, 0L))
                val (n1, c1) = (n0 + r.getLong(1), c0 + r.getLong(2))
                if (n1 == 0L) state.remove(g) else state(g) = (n1, c1)
              }
            ()
          }.start()
        try q.processAllAvailable() finally q.stop()
      }
      // phase 1: both slices land; the stream catches up, then STOPS
      spark.sql("INSERT INTO graft_cat.db.ivm_evidence " +
        s"SELECT * FROM ($evSql) t WHERE k % 2 = 0")
      spark.sql("INSERT INTO graft_cat.db.ivm_evidence " +
        s"SELECT * FROM ($evSql) t WHERE k % 2 = 1")
      drain()
      // phase 2: a COW update mutates under the stopped stream; resume
      spark.sql("UPDATE graft_cat.db.ivm_evidence SET cents = cents * 3 " +
        "WHERE k % 5 = 0")
      drain()
      // phase 3: merge-on-read delete + compaction; resume again
      spark.sql(
        "DELETE FROM graft_cat.db.ivm_evidence WHERE cents >= 30000")
      spark.sql("CALL graft_cat.sys.compact('db', 'ivm_evidence', " +
        s"${64L * 1024 * 1024})")
      drain()
      val streamRows = state.toSeq.map { case (g, (n, c)) => (g, n, c) }
      val batchRows = spark.sql(
        """SELECT k % 9 AS g, count(*) AS n, sum(cents) AS cents
          |FROM graft_cat.db.ivm_evidence GROUP BY 1""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      def fmt(t: (Long, Long, Long)) = s"${t._1}|${t._2}|${t._3}"
      TwinResult("incremental_mv_on_cdf", unit = "groups",
        streamRows.length.toLong, batchRows.length.toLong,
        md5(streamRows.map(fmt)), md5(batchRows.map(fmt)),
        chops = 3)
    }

    // ---- twin 10: STREAMING WAP (write-audit-publish) ----
    // A stream writes its micro-batches to a BRANCH (each epoch a
    // branch-chain commit — main's content and version history never
    // move while the stream runs), the audited head publishes atomically
    // via sys.fast_forward, and a downstream `.changes` consumer on MAIN
    // sees exactly the published rows in ONE version. The 100 TB WAP
    // discipline applied to a live stream: audit continuously, publish
    // atomically, lose nothing.
    val wap = {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.db")
      spark.sql("DROP TABLE IF EXISTS graft_cat.db.wap_evidence")
      spark.sql(
        "CREATE TABLE graft_cat.db.wap_evidence (k BIGINT, cents BIGINT)")
      val evSql = s"""SELECT event_id AS k,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |FROM parquet.`$sfDir/events.parquet`
        |WHERE value IS NOT NULL AND event_id < 4000""".stripMargin
      // main seeds with the even slice
      spark.sql("INSERT INTO graft_cat.db.wap_evidence " +
        s"SELECT * FROM ($evSql) t WHERE k % 2 = 0")
      val nMain0 = spark.sql(
        "SELECT count(*) FROM graft_cat.db.wap_evidence")
        .collect().head.getLong(0)
      // the audited stream: odd slice, 3 chops, committed on the branch
      spark.sql("CALL graft_cat.sys.branch('db', 'wap_evidence', 'audit')")
      val slice = spark.sql(s"SELECT * FROM ($evSql) t WHERE k % 2 = 1")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val chunks = slice.grouped((slice.length / 3).max(1)).toSeq
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-wap-ckpt").toString
      val input = MemoryStream[(Long, Long)]
      val q = input.toDF().toDF("k", "cents").writeStream
        .option("checkpointLocation", ckpt).outputMode("append")
        .toTable("graft_cat.db.wap_evidence.branch_audit")
      try chunks.foreach { ch =>
        input.addData(ch.toSeq: _*); q.processAllAvailable()
      } finally q.stop()
      // audit invisibility: main never moved while the stream committed
      require(spark.sql("SELECT count(*) FROM graft_cat.db.wap_evidence")
        .collect().head.getLong(0) == nMain0,
        "branch stream leaked into main before publish")
      // downstream consumer on MAIN's change feed, attached pre-publish
      val landed = collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val ckpt2 = java.nio.file.Files
        .createTempDirectory("graft-wap-cdf-ckpt").toString
      def drainMain(): Unit = {
        val c = spark.readStream.table("graft_cat.db.wap_evidence.changes")
          .writeStream.option("checkpointLocation", ckpt2)
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.collect().foreach { r =>
              require(r.getString(2) == "insert",
                s"unexpected ${r.getString(2)} in the WAP publish feed")
              landed += ((r.getLong(0), r.getLong(1)))
            }
            ()
          }.start()
        try c.processAllAvailable() finally c.stop()
      }
      drainMain() // consumes the seed slice
      val seedSeen = landed.length
      require(seedSeen == nMain0, "feed baseline missed the seed slice")
      landed.clear()
      // PUBLISH: the whole audited stream lands as ONE main version
      spark.sql(
        "CALL graft_cat.sys.fast_forward('db', 'wap_evidence', 'audit')")
      drainMain() // consumes exactly the published rows
      def fmt(t: (Long, Long)) = s"${t._1}|${t._2}"
      TwinResult("streaming_wap_publish", unit = "rows",
        landed.length.toLong, slice.length.toLong,
        md5(landed.toSeq.map(fmt)), md5(slice.toSeq.map(fmt)),
        chops = chunks.length)
    }

    val twins =
      Seq(dedup, spatial, asof, tws, eos, cat, upsert, cdf, ivm, wap)
    val allPass = twins.forall(_.pass)
    val json =
      s"""{"sf":"$sfDir","twins":[${twins.map(_.json).mkString(",")}],""" +
        s""""all_pass":$allPass}"""
    val out = new java.io.File(outFile)
    Option(out.getParentFile).foreach(_.mkdirs())
    val w = new java.io.PrintWriter(out, "UTF-8")
    try w.println(json) finally w.close()
    twins.foreach(t => println(s"[streaming-evidence] ${t.name}: " +
      s"${if (t.pass) "PASS" else "FAIL"} (${t.nStream} stream ${t.unit}, " +
      s"${t.nBatch} batch ${t.unit})"))
    println(s"[streaming-evidence] artifact written to $outFile")
    spark.stop()
    if (!allPass) sys.exit(1)
  }
}
