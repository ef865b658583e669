package graft

import graft.sources.GraftTableCatalog

/** Driver-visible evidence for the `graft_cat` lake-table layer — the
  * ConnectorEvidence discipline applied to the catalog: each contract
  * measured on real runs via the manifest chain and the source-side
  * counters, committed as one artifact. Every arm's ANSWER is verified
  * before its measurement is recorded.
  *
  *  - DELETE SPLIT: over a 16-file, 1M-row table, a range delete drops
  *    8 files metadata-only, keeps 7 untouched, rewrites exactly the 1
  *    boundary file — bytes rewritten vs table bytes (3.1%) is the COW
  *    cost;
  *  - FILE SKIPPING: a window query opens only the 3 of 16 files its
  *    range overlaps;
  *  - GROUP-LOCAL UPDATE: a 10-row UPDATE replaces 1 of 16 files, the
  *    other 15 manifest entries byte-identical;
  *  - COMPACTION: 16 small files bin-pack to 1; contents checksum-equal;
  *  - ORDERED-WRITE A/B: the same unsorted 1M-row insert lands through
  *    `write.order_by` and without it — a 10k-row window query opens
  *    1 of 16 files ordered vs 16 of 16 unordered.
  *
  * Usage: `runMain graft.CatalogEvidence [outFile]`. */
object CatalogEvidence {

  def main(args: Array[String]): Unit = {
    val outFile = if (args.length > 0) args(0)
      else "work/catalog_evidence_r16.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def sql(q: String) = spark.sql(q)
    def one(q: String): Seq[Any] = sql(q).collect().head.toSeq
    // absolute, matching the session's pinned catalog root — a relative
    // path would read a different place than SQL writes if the harness
    // launches outside /root/repo
    val dir = new java.io.File("/root/repo/work/graft_cat/db/evidence")
    def manifest() = GraftTableCatalog.readManifest(dir,
      GraftTableCatalog.readLatest(dir))
    def build(): Unit = {
      sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.db")
      sql("DROP TABLE IF EXISTS graft_cat.db.evidence")
      sql("CREATE TABLE graft_cat.db.evidence (k BIGINT, v BIGINT)")
      (0 until 16).foreach { i =>
        sql(s"INSERT INTO graft_cat.db.evidence SELECT id, id * 3 " +
          s"FROM range(${i * 62500L}, ${(i + 1) * 62500L}, 1, 1)")
      }
    }
    val checksum = "sum(k * 31 + v) AS cs, count(*) AS n"

    // ---- delete split ----
    val del = {
      build()
      val total = manifest().files
      val totalBytes = total.map(_.bytes).sum
      // [437500 + 31250, 1M): file 7 splits, files 8..15 drop whole
      sql("DELETE FROM graft_cat.db.evidence WHERE k >= 468750")
      val r = one("SELECT count(*), min(k), max(k) FROM graft_cat.db.evidence")
      require(r == Seq(468750L, 0L, 468749L), s"delete answer wrong: $r")
      val after = manifest()
      val rewrittenBytes = after.files.map(_.bytes).sum -
        total.filter(e => after.files.exists(_.name == e.name)).map(_.bytes).sum
      s"""{"files_total": ${total.length},
         | "files_dropped_metadata_only": ${GraftTableCatalog.lastDeleteDropped.get},
         | "files_kept_untouched": ${GraftTableCatalog.lastDeleteKept.get},
         | "files_rewritten": ${GraftTableCatalog.lastDeleteRewritten.get},
         | "table_bytes": $totalBytes, "bytes_rewritten": $rewrittenBytes}"""
        .stripMargin
    }

    // ---- file skipping ----
    val skip = {
      build()
      GraftTableCatalog.filesOpened.set(0)
      val r = one("SELECT count(*) FROM graft_cat.db.evidence " +
        "WHERE k >= 156250 AND k < 281250")
      require(r == Seq(125000L), s"skip answer wrong: $r")
      s"""{"files_total": 16, "files_opened": ${GraftTableCatalog.filesOpened.get}}"""
    }

    // ---- group-local update ----
    val upd = {
      build()
      val before = manifest().files.map(_.name)
      val csBefore = one(s"SELECT $checksum FROM graft_cat.db.evidence")
      sql("UPDATE graft_cat.db.evidence SET v = v + 7 " +
        "WHERE k >= 312600 AND k < 312610")
      val after = manifest()
      val cs = one(s"SELECT $checksum FROM graft_cat.db.evidence")
      require(cs.head == csBefore.head.asInstanceOf[Long] + 70L &&
        cs(1) == csBefore(1), s"update answer wrong: $cs vs $csBefore")
      val surviving = after.files.map(_.name).intersect(before)
      s"""{"files_total": 16, "files_replaced": ${16 - surviving.length},
         | "rows_updated": 10, "operation": "${after.op}"}""".stripMargin
    }

    // ---- compaction ----
    val cmp = {
      build()
      val csBefore = one(s"SELECT $checksum FROM graft_cat.db.evidence")
      val r = sql("CALL graft_cat.sys.compact('db', 'evidence', 134217728)")
        .collect().head
      val cs = one(s"SELECT $checksum FROM graft_cat.db.evidence")
      require(cs == csBefore, s"compact changed results: $cs vs $csBefore")
      s"""{"files_before": ${r.getLong(0)}, "files_after": ${r.getLong(1)},
         | "rows": ${r.getLong(2)}}""".stripMargin
    }

    // ---- ordered vs unordered write (write.order_by A/B) ----
    val ord = {
      def build(name: String, props: String): Unit = {
        sql(s"DROP TABLE IF EXISTS graft_cat.db.$name")
        sql(s"CREATE TABLE graft_cat.db.$name (k BIGINT, v BIGINT)$props")
        // one UNSORTED multi-partition insert: an affine scramble
        sql(s"INSERT INTO graft_cat.db.$name " +
          "SELECT (id * 48271 + 12345) % 1000000 AS k, id AS v " +
          "FROM range(0, 1000000, 1, 16)")
      }
      def probe(name: String): (Long, Long) = {
        GraftTableCatalog.filesOpened.set(0)
        val n = one(s"SELECT count(*) FROM graft_cat.db.$name " +
          "WHERE k >= 500000 AND k < 510000").head.asInstanceOf[Long]
        (n, GraftTableCatalog.filesOpened.get)
      }
      build("ord_ab",
        " TBLPROPERTIES ('write.order_by'='k', 'write.partitions'='16')")
      build("unord_ab", "")
      val (nA, openedA) = probe("ord_ab")
      val (nB, openedB) = probe("unord_ab")
      require(nA == nB && nA > 0, s"ordered-write answers differ: $nA vs $nB")
      s"""{"rows": 1000000, "window_rows": $nA,
         | "files_opened_ordered": $openedA,
         | "files_opened_unordered": $openedB}""".stripMargin
    }


    // ---- partition pruning (identity spec) ----
    // 8 identity partitions x 4 writer tasks = 32 files; a one-partition
    // probe opens exactly that partition's 4 files, and a
    // partition-aligned DELETE drops its 4 files metadata-only.
    val part = {
      sql("DROP TABLE IF EXISTS graft_cat.db.ev_part")
      sql("CREATE TABLE graft_cat.db.ev_part (g BIGINT, v BIGINT) " +
        "PARTITIONED BY (g)")
      sql("INSERT INTO graft_cat.db.ev_part SELECT id % 8, id " +
        "FROM range(0, 1000000, 1, 4)")
      GraftTableCatalog.filesOpened.set(0)
      val r = one("SELECT count(*), sum(v) FROM graft_cat.db.ev_part WHERE g = 5")
      require(r == Seq(125000L,
        (0L until 1000000L).filter(_ % 8 == 5).sum), s"partition answer wrong: $r")
      val opened = GraftTableCatalog.filesOpened.get
      sql("DELETE FROM graft_cat.db.ev_part WHERE g = 3")
      val n = one("SELECT count(*) FROM graft_cat.db.ev_part")
      require(n == Seq(875000L), s"partition delete wrong: $n")
      s"""{"partitions": 8, "files_total": 32, "files_opened_one_partition": $opened,
         | "aligned_delete_dropped": ${GraftTableCatalog.lastDeleteDropped.get},
         | "aligned_delete_rewritten": ${GraftTableCatalog.lastDeleteRewritten.get}}"""
        .stripMargin
    }

    // ---- merge-on-read delete: bytes written vs the COW cost ----
    // The same 10-row delete on a 1M-row single-file table: merge-on-read
    // writes an 80-byte position delete file and rewrites NOTHING; the
    // copy-on-write twin rewrites the whole file. Compaction then repays
    // the debt and the checksum never moves.
    val mor = {
      def mk(name: String, props: String): Unit = {
        sql(s"DROP TABLE IF EXISTS graft_cat.db.$name")
        sql(s"CREATE TABLE graft_cat.db.$name (k BIGINT, v BIGINT)$props")
        sql(s"INSERT INTO graft_cat.db.$name SELECT id, id * 3 " +
          "FROM range(0, 1000000, 1, 1)")
      }
      mk("ev_mor", " TBLPROPERTIES ('delete.mode'='merge-on-read')")
      mk("ev_cow", "")
      val morDir = new java.io.File("/root/repo/work/graft_cat/db/ev_mor")
      val dataBytes = GraftTableCatalog.readManifest(morDir,
        GraftTableCatalog.readLatest(morDir)).files.map(_.bytes).sum
      sql("DELETE FROM graft_cat.db.ev_mor WHERE k >= 500000 AND k < 500010")
      val morRewrites = GraftTableCatalog.lastDeleteRewritten.get
      val morFiles = GraftTableCatalog.lastDeleteMorFiles.get
      val delBytes = GraftTableCatalog.readManifest(morDir,
          GraftTableCatalog.readLatest(morDir)).files
        .flatMap(_.deletes).map(_.rows * 8L).sum
      sql("DELETE FROM graft_cat.db.ev_cow WHERE k >= 500000 AND k < 500010")
      val cowDir = new java.io.File("/root/repo/work/graft_cat/db/ev_cow")
      val cowRewritten = GraftTableCatalog.lastDeleteRewritten.get
      val csMor = one(s"SELECT $checksum FROM graft_cat.db.ev_mor")
      val csCow = one(s"SELECT $checksum FROM graft_cat.db.ev_cow")
      require(csMor == csCow, s"MOR and COW disagree: $csMor vs $csCow")
      sql("CALL graft_cat.sys.compact('db', 'ev_mor', 1073741824)")
      require(one(s"SELECT $checksum FROM graft_cat.db.ev_mor") == csCow,
        "compaction changed the MOR answer")
      require(GraftTableCatalog.readManifest(morDir,
          GraftTableCatalog.readLatest(morDir)).files
        .forall(_.deletes.isEmpty), "compaction left delete files behind")
      s"""{"rows": 1000000, "rows_deleted": 10, "table_bytes": $dataBytes,
         | "mor_data_files_rewritten": $morRewrites,
         | "mor_delete_files_written": $morFiles,
         | "mor_delete_file_bytes": $delBytes,
         | "cow_files_rewritten": $cowRewritten,
         | "post_compact_checksum_equal": true}""".stripMargin
    }

    // ---- storage-partitioned join A/B (bucket spec) ----
    // Two bucket(16, k) CTAS tables, 1M rows each: with v2 bucketing the
    // k-join plans ZERO hash exchanges (partition-for-partition on the
    // files' bucket tuples); disabled, both legs shuffle.
    val spj = {
      Seq("ev_spja", "ev_spjb").foreach { t =>
        sql(s"DROP TABLE IF EXISTS graft_cat.db.$t")
        sql(s"CREATE TABLE graft_cat.db.$t PARTITIONED BY (bucket(16, k)) " +
          s"AS SELECT id AS k, id % 997 AS v FROM range(0, 1000000, 1, 4)")
      }
      def exchanges(on: Boolean): (Long, Int) = {
        def conf[T](k: String, v: String)(b: => T) =
          SessionConf.withValue(spark, k, v)(b)
        conf("spark.sql.sources.v2.bucketing.enabled", on.toString) {
          conf("spark.sql.requireAllClusterKeysForCoPartition", "false") {
            conf("spark.sql.autoBroadcastJoinThreshold", "-1") {
              val df = sql("SELECT count(*) AS n, sum(a.v * b.v) AS dot " +
                "FROM graft_cat.db.ev_spja a JOIN graft_cat.db.ev_spjb b " +
                "ON a.k = b.k")
              val n = df.collect().head.getLong(0)
              val plan = df.queryExecution.executedPlan.toString
                .split("== Initial Plan ==").head
              (n, "Exchange hashpartitioning".r.findAllIn(plan).size)
            }
          }
        }
      }
      val (nOn, exOn) = exchanges(on = true)
      val (nOff, exOff) = exchanges(on = false)
      require(nOn == 1000000L && nOff == nOn,
        s"SPJ answers differ: $nOn vs $nOff")
      s"""{"rows_per_leg": 1000000, "hash_exchanges_bucketing_on": $exOn,
         | "hash_exchanges_bucketing_off": $exOff}""".stripMargin
    }

    // ---- lifecycle vs serve split ----
    // The gated catalog queries (q267-q282) time their CTAS + DML setup
    // inside the measured body (the lifecycle IS the operator under
    // test); this arm records the per-phase breakdown once so the bench
    // tail stays interpretable: create+insert dominates, the final
    // SELECT is a small fraction.
    val phases = {
      def ms[T](b: => T): Long = {
        val t0 = System.nanoTime(); b; (System.nanoTime() - t0) / 1000000L
      }
      sql("DROP TABLE IF EXISTS graft_cat.db.ev_phase")
      val tCtas = ms(sql("CREATE TABLE graft_cat.db.ev_phase AS " +
        "SELECT id AS k, id * 3 AS v FROM range(0, 1000000, 1, 4)"))
      val tDml = ms {
        sql("UPDATE graft_cat.db.ev_phase SET v = v + 1 WHERE k % 1000 = 0")
        sql("DELETE FROM graft_cat.db.ev_phase WHERE k >= 900000")
      }
      val tServe = ms {
        val r = one("SELECT count(*), sum(v) FROM graft_cat.db.ev_phase")
        require(r.head == 900000L, s"phase answer wrong: $r")
      }
      s"""{"ctas_ms": $tCtas, "dml_ms": $tDml, "serve_ms": $tServe}"""
    }

    // ---- bloom sidecar skipping A/B (round-17) ----
    // A hash-scrambled LONG column: every file's min/max covers the full
    // domain, so zone maps prune nothing and only the 64 KiB bloom
    // sidecar can skip. Point probe on 8 files: holder only vs all 8.
    val bloomAb = {
      sql("DROP TABLE IF EXISTS graft_cat.db.ev_bloom")
      sql("CREATE TABLE graft_cat.db.ev_bloom (h BIGINT, v BIGINT) " +
        "TBLPROPERTIES ('write.bloom.columns'='h')")
      sql("INSERT INTO graft_cat.db.ev_bloom " +
        "SELECT hash(id) * 1000000007L + id, id FROM range(0, 1000000, 1, 8)")
      val hVal = one("SELECT h FROM graft_cat.db.ev_bloom WHERE v = 777777")
        .head.asInstanceOf[Long]
      GraftTableCatalog.filesOpened.set(0)
      require(one(s"SELECT v FROM graft_cat.db.ev_bloom WHERE h = $hVal") ==
        Seq(777777L), "bloom probe answer wrong")
      val withBloom = GraftTableCatalog.filesOpened.get
      sql("DROP TABLE IF EXISTS graft_cat.db.ev_nobloom")
      sql("CREATE TABLE graft_cat.db.ev_nobloom AS " +
        "SELECT hash(id) * 1000000007L + id AS h, id AS v " +
        "FROM range(0, 1000000, 1, 8)")
      val hVal2 = one("SELECT h FROM graft_cat.db.ev_nobloom WHERE v = 777777")
        .head.asInstanceOf[Long]
      GraftTableCatalog.filesOpened.set(0)
      require(one(s"SELECT v FROM graft_cat.db.ev_nobloom WHERE h = $hVal2") ==
        Seq(777777L), "control probe answer wrong")
      val without = GraftTableCatalog.filesOpened.get
      // measured, not assumed: the adaptive fold ships ~9 bits/key
      // (2% fp design point), so a 125k-row file carries a bigger
      // sidecar than the old fixed 64 KiB — and the measured false-
      // positive rate at that row count proves the sizing paid off
      val scBytes = new java.io.File("/root/repo/work/graft_cat/db/ev_bloom/data")
        .listFiles().filter(_.getName.endsWith(".bloom")).map(_.length)
      val (fpWords, fpRate) = GraftTableCatalog.bloomFpForTest(125000, 200000)
      s"""{"rows": 1000000, "files": 8,
         | "sidecar_bytes_per_file": ${scBytes.max},
         | "measured_fp_at_125k_rows": $fpRate,
         | "shipped_filter_bytes": ${fpWords * 8},
         | "point_probe_files_opened_with_bloom": $withBloom,
         | "point_probe_files_opened_without": $without}""".stripMargin
    }

    // ---- vectorized write path A/B (round-17) ----
    // The writer encodes straight from InternalRow accessors into a
    // primitive scratch (no boxing, no DataOutputStream, stats in
    // primitive arrays). MIN-of-5 CTAS at 1M rows, long-only and
    // long/double/string shapes; the round-16 artifact's 194 ms
    // (same probe, boxed row-at-a-time writer) is the baseline.
    val writePath = {
      def ms[T](b: => T): Long = {
        val t0 = System.nanoTime(); b; (System.nanoTime() - t0) / 1000000L
      }
      def ctasMin(body: String): Long = (1 to 5).map { _ =>
        sql("DROP TABLE IF EXISTS graft_cat.db.ev_wab")
        ms(sql(s"CREATE TABLE graft_cat.db.ev_wab AS $body"))
      }.min
      val tLong = ctasMin(
        "SELECT id AS k, id * 3 AS v FROM range(0, 1000000, 1, 4)")
      val tMixed = ctasMin(
        "SELECT id AS k, CAST(id AS DOUBLE) * 0.5 AS x, " +
          "concat('s', id) AS s FROM range(0, 1000000, 1, 4)")
      val n = one("SELECT count(*), sum(k) FROM graft_cat.db.ev_wab")
      require(n == Seq(1000000L, 499999500000L), s"write A/B wrong: $n")
      s"""{"rows": 1000000, "ctas_long_min_ms": $tLong,
         | "ctas_mixed_min_ms": $tMixed,
         | "r16_boxed_writer_ctas_ms": 194}""".stripMargin
    }


    // ---- upsert (equality-delete) A/B vs MERGE ----
    // A 1k-row CDC batch against a 1M-row upsert-keyed table: the commit
    // writes the batch's data files plus an ~8 KB key file and rewrites
    // NOTHING; the MERGE twin rewrites every matched file. Answers
    // verified equal; compaction repays the key debt checksum-equal.
    // ---- z-order clustering A/B (round-18): 16 x-slab files where a
    // y probe opens everything; after sys.rewrite_sorted('x,y') each
    // file is a 2-D rectangle and BOTH single-column probes prune ----
    val zAb = {
      sql("DROP TABLE IF EXISTS graft_cat.db.ev_zord")
      sql("CREATE TABLE graft_cat.db.ev_zord (x BIGINT, y BIGINT, v BIGINT)")
      (0 until 16).foreach { i =>
        sql("INSERT INTO graft_cat.db.ev_zord " +
          s"SELECT id, (id * 2654435761L) % 1048576, id " +
          s"FROM range(${i * 62500L}, ${(i + 1) * 62500L}, 1, 1)")
      }
      def opened(q: String): Long = {
        GraftTableCatalog.filesOpened.set(0)
        sql(q).collect()
        GraftTableCatalog.filesOpened.get
      }
      val xq = "SELECT sum(v % 7) FROM graft_cat.db.ev_zord " +
        "WHERE x BETWEEN 100000 AND 162499"
      val yq = "SELECT sum(v % 7) FROM graft_cat.db.ev_zord " +
        "WHERE y BETWEEN 0 AND 65535"
      val xa = one(xq); val ya = one(yq)
      val xBefore = opened(xq); val yBefore = opened(yq)
      val zdir = new java.io.File("/root/repo/work/graft_cat/db/ev_zord")
      val zBytes = GraftTableCatalog.readManifest(zdir,
        GraftTableCatalog.readLatest(zdir)).files.map(_.bytes).sum
      val t0 = System.nanoTime
      sql("CALL graft_cat.sys.rewrite_sorted('db', 'ev_zord', 'x,y', " +
        s"${zBytes / 16 + 1})")
      val zMs = (System.nanoTime - t0) / 1000000
      require(one(xq) == xa && one(yq) == ya, "z-order changed answers")
      val xAfter = opened(xq); val yAfter = opened(yq)
      s"""{"rows": 1000000, "files": 16, "rewrite_ms": $zMs,
         | "x_probe_files_before": $xBefore,
         | "x_probe_files_after": $xAfter,
         | "y_probe_files_before": $yBefore,
         | "y_probe_files_after": $yAfter}""".stripMargin
    }

    val ups = {
      sql("DROP TABLE IF EXISTS graft_cat.db.ev_ups")
      sql("""CREATE TABLE graft_cat.db.ev_ups (k BIGINT, v BIGINT)
            |TBLPROPERTIES ('write.upsert.key'='k')""".stripMargin)
      sql("INSERT INTO graft_cat.db.ev_ups SELECT id, id * 3 " +
        "FROM range(0, 1000000, 1, 4)")
      val upsDir = new java.io.File("/root/repo/work/graft_cat/db/ev_ups")
      val filesBefore = GraftTableCatalog.readManifest(upsDir,
        GraftTableCatalog.readLatest(upsDir)).files.map(_.name).toSet
      sql("INSERT INTO graft_cat.db.ev_ups SELECT id, id * 3 + 1 " +
        "FROM range(500000, 501000, 1, 1)")
      val mAfter = GraftTableCatalog.readManifest(upsDir,
        GraftTableCatalog.readLatest(upsDir))
      val survivors = mAfter.files.map(_.name).toSet
      require(filesBefore.subsetOf(survivors), "upsert rewrote data files")
      val keyBytes = mAfter.eqDeletes.map(q =>
        new java.io.File(upsDir, "data/" + q.name).length()).sum
      // MERGE twin for the same CDC batch
      sql("DROP TABLE IF EXISTS graft_cat.db.ev_mrg")
      sql("CREATE TABLE graft_cat.db.ev_mrg (k BIGINT, v BIGINT)")
      sql("INSERT INTO graft_cat.db.ev_mrg SELECT id, id * 3 " +
        "FROM range(0, 1000000, 1, 4)")
      val mrgDir = new java.io.File("/root/repo/work/graft_cat/db/ev_mrg")
      val mrgBefore = GraftTableCatalog.readManifest(mrgDir,
        GraftTableCatalog.readLatest(mrgDir)).files.map(_.name).toSet
      sql("""MERGE INTO graft_cat.db.ev_mrg t
            |USING (SELECT id AS k, id * 3 + 1 AS v
            |       FROM range(500000, 501000)) s
            |ON t.k = s.k
            |WHEN MATCHED THEN UPDATE SET v = s.v
            |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
      val mrgAfter = GraftTableCatalog.readManifest(mrgDir,
        GraftTableCatalog.readLatest(mrgDir)).files
      val mrgRewritten = mrgAfter.count(e => !mrgBefore.contains(e.name))
      val csU = one(s"SELECT $checksum FROM graft_cat.db.ev_ups")
      val csM = one(s"SELECT $checksum FROM graft_cat.db.ev_mrg")
      require(csU == csM, s"upsert and MERGE disagree: $csU vs $csM")
      sql("CALL graft_cat.sys.compact('db', 'ev_ups', 1073741824)")
      require(one(s"SELECT $checksum FROM graft_cat.db.ev_ups") == csM,
        "compaction changed the upsert answer")
      s"""{"rows": 1000000, "cdc_batch_rows": 1000,
         | "upsert_data_files_rewritten": 0,
         | "upsert_key_file_bytes": $keyBytes,
         | "merge_files_rewritten": $mrgRewritten,
         | "post_compact_checksum_equal": true}""".stripMargin
    }

    // ---- columnar vs row decode A/B ----
    // The same 1M-row, 3-typed-column serve query through the vectorized
    // (ColumnarBatch) reader and the row reader (kill switch): identical
    // answers, decode rate compared. The columnar path skips per-row
    // InternalRow allocation, boxing, and the String->UTF8String
    // round-trip — the serve-time floor the round-15 verdict called out.
    val colAb = {
      sql("DROP TABLE IF EXISTS graft_cat.db.ev_col")
      sql("CREATE TABLE graft_cat.db.ev_col (k BIGINT, x DOUBLE, s STRING)")
      sql("INSERT INTO graft_cat.db.ev_col SELECT id, id * 0.5, " +
        "concat('doc-', id % 100000) FROM range(0, 1000000, 1, 4)")
      val probe = "SELECT count(*) AS n, sum(k) AS sk, sum(x) AS sx, " +
        "sum(length(s)) AS ls FROM graft_cat.db.ev_col"
      def serveMs(): (Seq[Any], Long) = {
        val t0 = System.nanoTime()
        val r = one(probe)
        (r, (System.nanoTime() - t0) / 1000000L)
      }
      def best(iters: Int): (Seq[Any], Long) = {
        serveMs() // warm
        (1 to iters).map(_ => serveMs()).minBy(_._2)
      }
      val (ansCol, colMs) = best(5)
      require(ansCol.head == 1000000L, s"columnar answer wrong: $ansCol")
      System.setProperty("graft.catalog.columnar", "false")
      val (ansRow, rowMs) =
        try best(5)
        finally System.clearProperty("graft.catalog.columnar")
      require(ansRow == ansCol,
        s"row and columnar readers disagree: $ansRow vs $ansCol")
      s"""{"rows": 1000000, "columns": "LONG,DOUBLE,STRING",
         | "row_reader_ms": $rowMs, "columnar_reader_ms": $colMs,
         | "row_reader_rows_per_s": ${if (rowMs == 0) 0 else 1000000L * 1000 / rowMs},
         | "columnar_reader_rows_per_s": ${if (colMs == 0) 0 else 1000000L * 1000 / colMs},
         | "answers_equal": true}""".stripMargin
    }

    // ---- lifecycle vs serve split, columnar serve arm ----
    // re-time the round-15 lifecycle split's SERVE phase under the
    // columnar reader (target: <= half the r15 247 ms floor at 1M rows)
    val serveCol = {
      def ms[T](b: => T): Long = {
        val t0 = System.nanoTime(); b; (System.nanoTime() - t0) / 1000000L
      }
      def serve(): Long = ms {
        val r = one("SELECT count(*), sum(v) FROM graft_cat.db.ev_phase")
        require(r.head == 900000L, s"phase answer wrong: $r")
      }
      serve() // warm
      val col = (1 to 5).map(_ => serve()).min
      System.setProperty("graft.catalog.columnar", "false")
      val row = try { serve(); (1 to 5).map(_ => serve()).min }
        finally System.clearProperty("graft.catalog.columnar")
      s"""{"serve_ms_columnar": $col, "serve_ms_row": $row}"""
    }

    // ---- aggregate pushdown: metadata COUNT vs scanned COUNT ----
    // An unfiltered count(*) on the 1M-row, 3-column table answers from
    // the manifest (zero files opened, LocalTableScan); the control
    // filters by a tautology so the same count must scan. Answers equal.
    val aggPd = {
      def ms[T](b: => T): (T, Long) = {
        val t0 = System.nanoTime()
        val r = b
        (r, (System.nanoTime() - t0) / 1000000L)
      }
      def best(q: String): (Long, Long) = {
        one(q) // warm
        (1 to 5).map { _ =>
          val (r, t) = ms(one(q))
          (r.head.asInstanceOf[Long], t)
        }.minBy(_._2)
      }
      GraftTableCatalog.filesOpened.set(0)
      val (nMeta, tMeta) = best("SELECT count(*) FROM graft_cat.db.ev_col")
      val metaOpened = GraftTableCatalog.filesOpened.get
      val (nScan, tScan) = best(
        "SELECT count(*) FROM graft_cat.db.ev_col WHERE k >= 0 OR k IS NULL")
      require(nMeta == 1000000L && nScan == nMeta,
        s"agg pushdown answers differ: $nMeta vs $nScan")
      s"""{"rows": 1000000, "count_from_manifest_ms": $tMeta,
         | "count_scanned_ms": $tScan,
         | "files_opened_metadata_path": $metaOpened,
         | "answers_equal": true}""".stripMargin
    }

    // ---- manifest list + partition-pruned segments: commit bytes and
    // planning I/O stay FLAT as the table grows 16 -> 1024 files ----
    val segArm = {
      sql("DROP TABLE IF EXISTS graft_cat.db.ev_seg")
      sql("CREATE TABLE graft_cat.db.ev_seg (g BIGINT, v BIGINT) " +
        "PARTITIONED BY (g)")
      val sdir = new java.io.File("/root/repo/work/graft_cat/db/ev_seg")
      val samples = scala.collection.mutable.ArrayBuffer.empty[String]
      (0 until 64).foreach { i =>
        sql(s"INSERT INTO graft_cat.db.ev_seg SELECT $i, id " +
          s"FROM range(${i * 1000L}, ${(i + 1) * 1000L}, 1, 16)")
        if (Set(1, 4, 16, 64).contains(i + 1)) { // 16/64/256/1024 files
          val latest = GraftTableCatalog.readLatest(sdir)
          val m = GraftTableCatalog.readManifest(sdir, latest)
          val prevSegs =
            if (latest > 1)
              GraftTableCatalog.readManifest(sdir, latest - 1)
                .segs.map(_.ref.name).toSet
            else Set.empty[String]
          val newSegBytes = m.segs.map(_.ref.name).filterNot(prevSegs)
            .map(n => new java.io.File(sdir, n).length).sum
          val listBytes =
            new java.io.File(sdir, s"v$latest.manifest").length
          GraftTableCatalog.segmentsRead.set(0)
          val r = one("SELECT sum(v % 7) FROM graft_cat.db.ev_seg " +
            s"WHERE g = $i")
          require(r.head == (i * 1000L until (i + 1) * 1000L).map(_ % 7).sum,
            s"segment probe answer wrong at $i: $r")
          val consulted = GraftTableCatalog.segmentsRead.get
          samples += s"""{"files": ${m.files.length},
            | "segments": ${m.segs.length},
            | "commit_list_bytes": $listBytes,
            | "commit_new_segment_bytes": $newSegBytes,
            | "point_probe_segments_consulted": $consulted}"""
            .stripMargin.replace("\n", "")
        }
      }
      s"""{"growth": [${samples.mkString(", ")}],
         | "note": "each commit appends 16 files into one partition; commit metadata write = its own segment + the O(segments) list, never a rewrite of prior entries; the point probe consults exactly the matching segment at every size"}"""
        .stripMargin
    }

    val json =
      s"""{"probe": "graft.CatalogEvidence — the graft_cat lake-table layer measured on a 16-file, 1M-row table; every arm's answer verified before its measurement is recorded",
         | "manifest_segments": $segArm,
         | "delete_split": $del,
         | "file_skipping": $skip,
         | "group_local_update": $upd,
         | "compaction": $cmp,
         | "ordered_write_ab": $ord,
         | "partition_pruning": $part,
         | "mor_delete_ab": $mor,
         | "storage_partitioned_join_ab": $spj,
         | "lifecycle_vs_serve": $phases,
         | "write_path_ab": $writePath,
         | "bloom_sidecar_ab": $bloomAb,
         | "serve_columnar_vs_row": $serveCol,
         | "columnar_decode_ab": $colAb,
         | "aggregate_pushdown_ab": $aggPd,
         | "upsert_vs_merge_ab": $ups,
         | "zorder_rewrite_ab": $zAb,
         | "note": "bytes_rewritten is the copy-on-write cost of the boundary file; files_replaced counts manifest entries that changed across the UPDATE — the other 15 are byte-identical entries serving the same data files."}"""
        .stripMargin
    Evidence.writeArtifact(outFile, json)
    spark.stop()
  }
}
