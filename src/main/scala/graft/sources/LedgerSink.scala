package graft.sources

import java.io.{DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `graft-ledger` — a transactional DataSource V2 SINK (+ its reader):
  * the write-side complement to `graft-series`, demonstrating the commit
  * protocol a real lake/warehouse connector must implement at 100 TB,
  * where thousands of tasks write concurrently, ANY of them can fail or
  * run twice (retries, speculation), and the table must only ever show
  * complete jobs.
  *
  * Protocol (the Iceberg/Delta snapshot discipline in miniature):
  *  - each task writes its rows to its OWN data file, named by
  *    (partitionId, taskId) so attempts never collide, and returns the
  *    file's name + row count as its [[WriterCommitMessage]];
  *  - nothing is visible until the DRIVER-side [[BatchWrite.commit]]
  *    writes a new manifest listing exactly the committed attempts'
  *    files and publishes it by ATOMIC RENAME — a failed or aborted job
  *    leaves stranded data files that no manifest references, and a
  *    task that ran twice contributes the one file its committed
  *    attempt named (Spark's output commit coordinator guarantees one
  *    committed attempt per task);
  *  - readers list the manifest, never the directory: partitions are
  *    manifest entries, so concurrent garbage is structurally invisible.
  *  - append = manifest(N+1) := manifest(N) ++ new files (single-writer
  *    per table path, the reference pipeline's own discipline);
  *    truncate (SaveMode.Overwrite) starts the list fresh.
  *
  * The row format is deliberately trivial — fixed (k BIGINT, v BIGINT)
  * pairs as raw longs — because the demonstration is the COMMIT
  * PROTOCOL, not an encoding; LedgerSinkSpec pins atomicity (a poisoned
  * task fails the job and the table still shows the PREVIOUS commit),
  * append, overwrite, and round-trip fidelity, and q262 hash-gates a
  * write-then-read pipeline against DuckDB computing straight from the
  * source table. */
class LedgerSink extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-ledger"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LedgerSink.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new LedgerTable(properties.asScala.getOrElse("path",
      sys.error("graft-ledger requires option 'path'")))
}

object LedgerSink {
  val schema: StructType = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", LongType, nullable = false)))

  private def manifestFile(dir: String) = new File(dir, "manifest.txt")

  /** One manifest, two record kinds: `F<tab>name<tab>rows` data files and
    * `E<tab>epochId` committed-epoch markers — kept in the SAME
    * atomically-renamed file so "which files are live" and "which epochs
    * already landed" can never disagree (a separate epoch ledger could
    * be one rename behind the manifest after a crash between renames). */
  def readManifest(dir: String): Seq[(String, Long)] =
    readAll(dir)._1

  def readEpochs(dir: String): Set[Long] = readAll(dir)._2

  private def readAll(dir: String): (Seq[(String, Long)], Set[Long]) = {
    val f = manifestFile(dir)
    if (!f.exists()) (Seq.empty, Set.empty)
    else {
      val lines = new String(Files.readAllBytes(f.toPath),
        StandardCharsets.UTF_8).linesIterator.filter(_.nonEmpty).toSeq
      val files = lines.collect { case l if l.startsWith("F\t") =>
        val Array(_, n, r) = l.split("\t"); (n, r.toLong)
      }
      val epochs = lines.collect { case l if l.startsWith("E\t") =>
        l.split("\t")(1).toLong
      }.toSet
      (files, epochs)
    }
  }

  /** Publish a new manifest by atomic rename — readers see the old list
    * or the new one, never a partial file. */
  def writeManifest(dir: String, entries: Seq[(String, Long)],
      epochs: Set[Long] = Set.empty): Unit = {
    val tmp = new File(dir, s"manifest.tmp.${java.util.UUID.randomUUID}")
    val body = (entries.map { case (n, r) => s"F\t$n\t$r" } ++
      epochs.toSeq.sorted.map(e => s"E\t$e")).mkString("\n")
    Files.write(tmp.toPath, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp.toPath, manifestFile(dir).toPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}

private class LedgerTable(dir: String) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_ledger($dir)"
  override def schema(): StructType = LedgerSink.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new LedgerScan(dir)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(info.schema().fields.map(f => (f.name, f.dataType)).toSeq ==
      LedgerSink.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"graft-ledger writes (k BIGINT, v BIGINT); got ${info.schema()}")
    new LedgerWriteBuilder(dir)
  }
}

private class LedgerWriteBuilder(dir: String) extends WriteBuilder
    with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new LedgerBatchWrite(dir, doTruncate)
    override def toStreaming: org.apache.spark.sql.connector.write.streaming
        .StreamingWrite = new LedgerStreamingWrite(dir)
  }
}

/** Streaming commits are EPOCH-IDEMPOTENT — exactly-once-effective at
  * the CONNECTOR level (the streaming twin of the engine's foreachBatch
  * idempotent sink, but owned by the sink itself): the manifest carries
  * committed-epoch markers, and a replayed epoch (post-crash micro-batch
  * re-run from the checkpoint) commits as a NO-OP, so its re-written
  * task files stay unreferenced garbage instead of duplicated rows.
  * Marker and file list live in one atomically-renamed manifest, so
  * they can never disagree. */
private[graft] class LedgerStreamingWrite(dir: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  private val jobUid = java.util.UUID.randomUUID().toString.take(8)

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): org.apache.spark.sql.connector.write
      .streaming.StreamingDataWriterFactory = {
    new File(dir, "data").mkdirs()
    LedgerStreamingWriterFactory(dir, jobUid)
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val files = LedgerSink.readManifest(dir)
    val epochs = LedgerSink.readEpochs(dir)
    if (epochs.contains(epochId)) return // replayed micro-batch: no-op
    val added = messages.map { case LedgerCommit(f, r) => (f, r) }.toSeq
    LedgerSink.writeManifest(dir, files ++ added, epochs + epochId)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case LedgerCommit(f, _) => new File(new File(dir, "data"), f).delete()
      case _ => ()
    }
}

private case class LedgerStreamingWriterFactory(dir: String, jobUid: String)
    extends org.apache.spark.sql.connector.write.streaming
      .StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    LedgerWriterFactory(dir, s"$jobUid-e$epochId").createWriter(
      partitionId, taskId)
}

private[graft] case class LedgerCommit(file: String, rows: Long)
    extends WriterCommitMessage

private class LedgerBatchWrite(dir: String, truncate: Boolean)
    extends BatchWrite {
  // Task ids restart at 0 per SparkContext, so (partitionId, taskId)
  // alone collides ACROSS APPLICATIONS writing the same path — a later
  // run's writer would truncate a file the live manifest references,
  // corrupting the committed table from a job that "published nothing".
  // A per-job uid makes every job's files disjoint.
  private val jobUid = java.util.UUID.randomUUID().toString.take(8)

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    new File(dir, "data").mkdirs()
    LedgerWriterFactory(dir, jobUid)
  }

  /** Runs on the DRIVER after every task has a committed attempt: only
    * now does anything become visible, and all of it at once. A
    * truncating commit also deletes the files the PREVIOUS manifest
    * referenced — after the new manifest is live, they are unreferenced
    * garbage this writer provably owns the lifecycle of. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val added = messages.map { case LedgerCommit(f, r) => (f, r) }.toSeq
    val prior = LedgerSink.readManifest(dir)
    // a batch APPEND onto a streamed ledger must carry the epoch markers
    // forward — rewriting the manifest without them would let a later
    // replayed micro-batch re-commit its epoch and duplicate rows.
    // TRUNCATE resets both lists: a fresh table has no history.
    val priorEpochs = LedgerSink.readEpochs(dir)
    val base = if (truncate) Seq.empty else prior
    val epochs = if (truncate) Set.empty[Long] else priorEpochs
    LedgerSink.writeManifest(dir, base ++ added, epochs)
    if (truncate) prior.foreach { case (f, _) =>
      new File(new File(dir, "data"), f).delete()
    }
  }

  /** Best-effort cleanup; correctness never depends on it — unmanifested
    * files are invisible whether or not the delete ran. */
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case LedgerCommit(f, _) => new File(new File(dir, "data"), f).delete()
      case _ => ()
    }
}

private case class LedgerWriterFactory(dir: String, jobUid: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // taskId is unique across attempts WITHIN an application; jobUid
      // separates applications — two attempts of one partition write two
      // files, and only the committed attempt's file is named in a
      // commit message
      private val name = s"part-$jobUid-p$partitionId-t$taskId.bin"
      private val file = new File(new File(dir, "data"), name)
      private val out = new DataOutputStream(new FileOutputStream(file))
      private var rows = 0L
      override def write(row: InternalRow): Unit = {
        out.writeLong(row.getLong(0)); out.writeLong(row.getLong(1))
        rows += 1
      }
      override def commit(): WriterCommitMessage = {
        out.close(); LedgerCommit(name, rows)
      }
      override def abort(): Unit = { out.close(); file.delete(); () }
      override def close(): Unit = out.close()
    }
}

private class LedgerScan(dir: String) extends Scan with Batch {
  override def readSchema(): StructType = LedgerSink.schema
  override def toBatch: Batch = this
  override def description(): String = s"graft-ledger $dir (manifest-listed)"

  override def planInputPartitions(): Array[InputPartition] =
    LedgerSink.readManifest(dir).map { case (f, rows) =>
      LedgerFile(new File(new File(dir, "data"), f).getPath, rows)
        : InputPartition
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    LedgerReaderFactory
}

private case class LedgerFile(path: String, rows: Long) extends InputPartition

private object LedgerReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val lf = p.asInstanceOf[LedgerFile]
    new PartitionReader[InternalRow] {
      private val in = new DataInputStream(new FileInputStream(lf.path))
      private var read = 0L
      override def next(): Boolean = read < lf.rows
      override def get(): InternalRow = {
        // fresh row per record: downstream operators may buffer without
        // copying (the SeriesSource reader's discipline)
        val row =
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
        row.update(0, in.readLong()); row.update(1, in.readLong())
        read += 1
        row
      }
      override def close(): Unit = in.close()
    }
  }
}
