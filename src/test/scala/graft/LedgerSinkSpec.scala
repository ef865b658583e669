package graft

import org.apache.spark.sql.functions._

import graft.sources.LedgerSink

/** The graft-ledger DSv2 sink's commit protocol: nothing visible until
  * the driver publishes the manifest, a failed job leaves the PREVIOUS
  * commit intact, append and truncate manage the manifest list, and the
  * round trip is exact. q262 hash-gates the write-then-read pipeline
  * against DuckDB computing from the source table directly. */
class LedgerSinkSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-ledger").toString

  private def pairs(lo: Long, hi: Long) =
    spark.range(lo, hi).select(col("id").as("k"), (col("id") * 3L).as("v"))

  private def readBack(dir: String) =
    spark.read.format("graft-ledger").option("path", dir).load()

  test("round trip, append, and truncate: the manifest is the table") {
    val dir = freshDir()
    pairs(0, 1000).write.format("graft-ledger").option("path", dir)
      .mode("append").save()
    readBack(dir).count() shouldBe 1000L
    readBack(dir).agg(sum(col("v"))).head().getLong(0) shouldBe
      3L * (0L until 1000L).sum
    // append: manifest v2 = v1 ++ new files
    pairs(1000, 1500).write.format("graft-ledger").option("path", dir)
      .mode("append").save()
    readBack(dir).count() shouldBe 1500L
    readBack(dir).select(col("k")).distinct().count() shouldBe 1500L
    // overwrite truncates the list — old files become invisible AND the
    // truncating commit collects them (it owns the prior manifest's
    // lifecycle); only the new manifest's files remain on disk
    pairs(7, 9).write.format("graft-ledger").option("path", dir)
      .mode("overwrite").save()
    readBack(dir).collect().map(_.getLong(0)).sorted.toSeq shouldBe Seq(7L, 8L)
    val live = LedgerSink.readManifest(dir).map(_._1).toSet
    val onDisk = new java.io.File(dir, "data").listFiles().map(_.getName).toSet
    onDisk shouldBe live
  }

  test("atomicity: a job with one poisoned task publishes NOTHING — the previous commit stays visible") {
    val dir = freshDir()
    pairs(0, 100).write.format("graft-ledger").option("path", dir)
      .mode("append").save()
    val before = LedgerSink.readManifest(dir)
    before should not be empty
    val poisoned = spark.range(0, 1000, 1, 8).as[Long]
      .map { v => if (v == 500L) sys.error("poisoned row — task dies"); (v, v) }
      .toDF("k", "v")
    intercept[Exception] {
      poisoned.write.format("graft-ledger").option("path", dir)
        .mode("append").save()
    }
    // the manifest never moved: the table still shows the first commit,
    // and whatever staging files the failed job strewed about are
    // structurally invisible (readers list the manifest, not the dir)
    LedgerSink.readManifest(dir) shouldBe before
    readBack(dir).count() shouldBe 100L
  }

  test("streaming write: micro-batches land through the same manifest protocol, epochs recorded") {
    implicit val sqlCtx = spark.sqlContext
    val dir = freshDir()
    val ckpt = freshDir()
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val q = input.toDF().toDF("k", "v")
      .writeStream.format("graft-ledger")
      .option("path", dir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      input.addData((1L, 10L), (2L, 20L)); q.processAllAvailable()
      input.addData((3L, 30L)); q.processAllAvailable()
    } finally q.stop()
    readBack(dir).collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe
      Set((1L, 10L), (2L, 20L), (3L, 30L))
    LedgerSink.readEpochs(dir).size should be >= 2
  }

  test("epoch idempotence: a replayed micro-batch commit is a NO-OP — the connector itself is exactly-once-effective") {
    val dir = freshDir()
    new java.io.File(dir, "data").mkdirs()
    // stage one real data file and commit it as epoch 7
    val f = new java.io.File(new java.io.File(dir, "data"), "part-replay.bin")
    val out = new java.io.DataOutputStream(new java.io.FileOutputStream(f))
    out.writeLong(42L); out.writeLong(420L); out.close()
    val sw = new graft.sources.LedgerStreamingWrite(dir)
    val msg: Array[org.apache.spark.sql.connector.write.WriterCommitMessage] =
      Array(graft.sources.LedgerCommit("part-replay.bin", 1L))
    sw.commit(7L, msg)
    val after = LedgerSink.readManifest(dir)
    readBack(dir).count() shouldBe 1L
    // the post-crash replay: same epoch arrives again (possibly from a
    // different writer instance) — nothing may change
    new graft.sources.LedgerStreamingWrite(dir).commit(7L, msg)
    LedgerSink.readManifest(dir) shouldBe after
    LedgerSink.readEpochs(dir) shouldBe Set(7L)
    readBack(dir).count() shouldBe 1L
    // a batch APPEND onto the streamed ledger carries the epoch markers
    // forward — a replay AFTER the append must still be a no-op
    pairs(100, 102).write.format("graft-ledger").option("path", dir)
      .mode("append").save()
    LedgerSink.readEpochs(dir) shouldBe Set(7L)
    readBack(dir).count() shouldBe 3L
    new graft.sources.LedgerStreamingWrite(dir).commit(7L, msg)
    readBack(dir).count() shouldBe 3L
  }

  test("schema contract: declaring the table schema makes Spark's analyzer reject incompatible frames before any task runs") {
    val dir = freshDir()
    val wrong = spark.range(0, 5).select(col("id").as("k"),
      col("id").cast("string").as("v"))
    val e = intercept[Exception] {
      wrong.write.format("graft-ledger").option("path", dir)
        .mode("append").save()
    }
    // Spark's own write-compatibility check fires off the DECLARED table
    // schema — the connector never sees a malformed row
    e.getMessage should include("INCOMPATIBLE_DATA_FOR_TABLE")
    LedgerSink.readManifest(dir) shouldBe empty
  }
}
