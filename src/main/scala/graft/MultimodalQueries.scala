package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

/** Multimodal query: documents → media table (binary payload + metadata
  * struct) → typed decode stub → features joined back with flattened
  * struct fields. The oracle recomputes every feature on the string side
  * (payloads are ASCII text bytes, so substr/md5/ascii agree byte-for-byte
  * with the binary-side JVM decode). */
object MultimodalQueries {
  import Queries.Q

  // The oracles slice by CHARACTER (DuckDB has no blob substring) while the
  // decode slices by BYTE — equal only when every char is one byte. Enforce
  // that fixture contract at runtime: any non-ASCII or empty document makes
  // the query throw instead of silently hash-mismatching.
  private def guardedDocs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documentsDistributed(s, d).where(assert_true(
      length(col("text")) > 0 && octet_length(col("text")) === length(col("text")),
      lit("multimodal contract: documents must be non-empty single-byte text")).isNull)

  val q25MultimodalDecode: Q = (s, d) => {
    import s.implicits._
    val media = Multimodal.mediaTable(guardedDocs(s, d))
    val typed = media.select(
        col("doc_id"), col("payload"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.channels").as("channels"), col("meta.format").as("format"))
      .as[MediaRow]
    val features = Multimodal.decodeFeatures(typed)
    // Nested-struct projection (meta.*) + join of decoded features back to
    // the metadata — both sides keyed on doc_id, features side is the
    // mapPartitions output.
    media.select(col("doc_id"), col("meta.*"))
      .join(features.toDF(), Seq("doc_id"))
  }

  /** q36: frame sampling + resize — one row per sampled "frame" (byte-slice
    * stand-in for video frames at a stride, capped), each digested, with the
    * resize stub's halved output dimensions carried alongside. Generator
    * shape: posexplode(sequence), codegen'd, partition-parallel. */
  val q36FrameSample: Q = (s, d) => {
    val media = Multimodal.mediaTable(guardedDocs(s, d))
    val (w2, h2) = Multimodal.resizeMeta(col("meta.width"), col("meta.height"), 2)
    val withResize = media.select(
      col("doc_id"), col("payload"), w2.as("out_w"), h2.as("out_h"))
    Multimodal.sampleFrames(withResize, carry = Seq("out_w", "out_h"))
  }

  val queries: Map[String, Q] = Map(
    "q25_multimodal_decode" -> q25MultimodalDecode,
    "q36_frame_sample"      -> q36FrameSample)

  val oracle: Map[String, String] = Map(
    "q25_multimodal_decode" ->
      """SELECT doc_id,
        |  CAST(n_chars % 640 AS INTEGER) AS width,
        |  CAST((doc_id * 7) % 480 AS INTEGER) AS height,
        |  3 AS channels,
        |  'fake/raw' AS format,
        |  octet_length(encode(text)) AS byte_len,
        |  ascii(substr(text, 1, 1)) AS codec_byte,
        |  hex(encode(substr(text, 1, 8))) AS header_hex,
        |  md5(substr(text, 1, 64)) AS frame0_md5,
        |  md5(substr(text, 102, 64)) AS frame1_md5,
        |  md5(substr(text, 203, 64)) AS frame2_md5
        |FROM documents""".stripMargin,
    // Same stride/cap arithmetic over char-indexed text (ASCII contract);
    // range() is exclusive-end, Spark's sequence() inclusive -> +1.
    "q36_frame_sample" ->
      """SELECT doc_id,
        |  CAST(i AS INTEGER) AS frame_idx,
        |  CAST(i * 101 AS INTEGER) AS frame_off,
        |  md5(substr(text, CAST(i * 101 + 1 AS INTEGER), 64)) AS frame_md5,
        |  CAST(greatest((n_chars % 640) // 2, 1) AS INTEGER) AS out_w,
        |  CAST(greatest(((doc_id * 7) % 480) // 2, 1) AS INTEGER) AS out_h
        |FROM documents,
        |  UNNEST(range(0, least((length(text) - 1) // 101, 7) + 1)) AS t(i)""".stripMargin)
}
