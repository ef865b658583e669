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

  /** q66: REAL image decode over a format-MIXED corpus — per doc, an actual
    * BMP or PNG payload (encoded by the matching `javax.imageio` writer from
    * deterministic pixels) is decoded by the reader the `format` column
    * selects from the registry; the output is true decoder output
    * (format + dimensions + decoded-raster digest). Both containers are
    * lossless, so the oracle reassembles the identical pixel byte stream
    * from the generating arithmetic with chr()/string_agg and must
    * hash-match for BOTH codecs — a real registry dispatch under the gate,
    * not a single-container special case. */
  val q66ImageDecode: Q = (s, d) => {
    Multimodal.decodeImages(
      Multimodal.imageTable(Tables.documentsDistributed(s, d))).toDF()
  }

  /** q67: corrupt-payload quarantine — the q66 corpus with DETERMINISTIC
    * injected damage (doc_id % 13: format relabeled to one with no
    * registered reader; else doc_id % 7: payload truncated to its first 8
    * bytes, an unparseable container for both codecs) run through the
    * quarantining decode: good docs come back as true decoder output, bad
    * docs as quarantine rows with a stable reason code, and the job never
    * dies. The oracle replays the same injection arithmetic: it KNOWS which
    * docs are damaged and why, reconstructs the decoded raster for the
    * rest, and the whole mixed result hash-matches. */
  val q67DecodeQuarantine: Q = (s, d) => {
    import s.implicits._
    val corrupted = Multimodal.imageTable(Tables.documentsDistributed(s, d))
      .map { r =>
        if (r.doc_id % 13 == 0) r.copy(format = "glyph9")
        else if (r.doc_id % 7 == 0) r.copy(payload = r.payload.take(8))
        else r
      }
    Multimodal.decodeImagesQuarantine(corrupted).toDF()
  }

  /** q122: perceptual-hash image dedup — q66's real decode path feeding
    * [[graft.operators.Multimodal.perceptualHash]] (integer average-hash
    * over the decoded raster), then a (dims, ahash)-keyed window counts
    * how many images share each perceptual bucket: the image-corpus
    * near-dup signal (identical content collides across containers — a
    * BMP and a PNG of the same pixels land in one bucket). The oracle
    * re-derives every hash from the generating pixel arithmetic — the
    * codec round-trip and the bit packing must both be exact. Scale
    * shape: decode is per-partition imperative work (the one legitimate
    * mapPartitions altitude), the window carries (doc_id, dims, hash) —
    * never payloads. */
  val q122PerceptualDedup: Q = (s, d) => {
    val hashed = Multimodal.perceptualHash(
      Multimodal.imageTable(Tables.documentsDistributed(s, d))).toDF()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("img_w"), col("img_h"), col("ahash"))
    hashed.withColumn("n_dups", count(lit(1)).over(w))
  }

  val queries: Map[String, Q] = Map(
    "q122_perceptual_dedup" -> q122PerceptualDedup,
    "q25_multimodal_decode" -> q25MultimodalDecode,
    "q36_frame_sample"      -> q36FrameSample,
    "q66_image_decode"      -> q66ImageDecode,
    "q67_decode_quarantine" -> q67DecodeQuarantine)

  val oracle: Map[String, String] = Map(
    // The aHash replayed from the generating pixel arithmetic: same
    // integer luminance, same cross-multiplied mean threshold, same
    // row-major bit packing.
    "q122_perceptual_dedup" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS format,
        |    CAST(doc_id % 6 + 2 AS INTEGER) AS w,
        |    CAST(doc_id % 4 + 2 AS INTEGER) AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, format, w, h, y, x,
        |    CAST((doc_id * 31 + x * 7 + y * 13) % 127 + 1
        |       + (doc_id * 31 + x * 7 + y * 13 + 5) % 127 + 1
        |       + (doc_id * 31 + x * 7 + y * 13 + 10) % 127 + 1 AS BIGINT) AS lum
        |  FROM dims,
        |    UNNEST(range(0, h)) t1(y),
        |    UNNEST(range(0, w)) t2(x)),
        |sc AS (
        |  SELECT doc_id, format, w, h, y, x, lum,
        |    sum(lum) OVER (PARTITION BY doc_id) AS total,
        |    count(*) OVER (PARTITION BY doc_id) AS npx
        |  FROM px),
        |ah AS (
        |  SELECT doc_id, any_value(format) AS format,
        |    CAST(any_value(w) AS INTEGER) AS img_w,
        |    CAST(any_value(h) AS INTEGER) AS img_h,
        |    CAST(sum(CASE WHEN lum * npx >= total
        |      THEN (CAST(1 AS BIGINT) << (y * w + x)) ELSE 0 END) AS BIGINT)
        |      AS ahash
        |  FROM sc GROUP BY doc_id)
        |SELECT doc_id, format, img_w, img_h, ahash,
        |  count(*) OVER (PARTITION BY img_w, img_h, ahash) AS n_dups
        |FROM ah""".stripMargin,
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
        |  UNNEST(range(0, least((length(text) - 1) // 101, 7) + 1)) AS t(i)""".stripMargin,
    // Reassembles the decoded raster byte-for-byte: pixel (x,y) channel c is
    // (doc_id*31 + x*7 + y*13 + c*5) % 127 + 1 — in [1,127], so chr() emits
    // exactly one byte per value and md5(string) hashes the same bytes the
    // JVM digests from the decoded BufferedImage.
    "q66_image_decode" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS format,
        |    CAST(doc_id % 6 + 2 AS INTEGER) AS w,
        |    CAST(doc_id % 4 + 2 AS INTEGER) AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, format, w, h, y, x, c,
        |    CAST((doc_id * 31 + x * 7 + y * 13 + c * 5) % 127 + 1 AS INTEGER) AS v
        |  FROM dims,
        |    UNNEST(range(0, h)) t1(y),
        |    UNNEST(range(0, w)) t2(x),
        |    UNNEST(range(0, 3)) t3(c))
        |SELECT doc_id,
        |  any_value(format) AS format,
        |  CAST(any_value(w) AS INTEGER) AS img_w,
        |  CAST(any_value(h) AS INTEGER) AS img_h,
        |  md5(string_agg(chr(v), '' ORDER BY y, x, c)) AS pixel_md5
        |FROM px GROUP BY doc_id""".stripMargin,
    // Replays the injection arithmetic: %13 -> unknown-format label, else
    // %7 -> truncated container; everything else decodes and its raster is
    // reassembled exactly as in q66. Quarantine rows carry NULL decode
    // columns and the stable reason code.
    "q67_decode_quarantine" ->
      """WITH cls AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 0 THEN 'glyph9'
        |         WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS format,
        |    CASE WHEN doc_id % 13 = 0 THEN 'no_decoder_for_format'
        |         WHEN doc_id % 7 = 0 THEN 'undecodable_payload' END AS reason,
        |    CAST(doc_id % 6 + 2 AS INTEGER) AS w,
        |    CAST(doc_id % 4 + 2 AS INTEGER) AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, format, w, h, y, x, c,
        |    CAST((doc_id * 31 + x * 7 + y * 13 + c * 5) % 127 + 1 AS INTEGER) AS v
        |  FROM cls,
        |    UNNEST(range(0, h)) t1(y),
        |    UNNEST(range(0, w)) t2(x),
        |    UNNEST(range(0, 3)) t3(c)
        |  WHERE reason IS NULL)
        |SELECT doc_id, any_value(format) AS format,
        |  'decoded' AS status,
        |  CAST(any_value(w) AS INTEGER) AS img_w,
        |  CAST(any_value(h) AS INTEGER) AS img_h,
        |  md5(string_agg(chr(v), '' ORDER BY y, x, c)) AS pixel_md5,
        |  CAST(NULL AS VARCHAR) AS quarantine_reason
        |FROM px GROUP BY doc_id
        |UNION ALL
        |SELECT doc_id, format, 'quarantined' AS status,
        |  CAST(NULL AS INTEGER) AS img_w, CAST(NULL AS INTEGER) AS img_h,
        |  CAST(NULL AS VARCHAR) AS pixel_md5, reason AS quarantine_reason
        |FROM cls WHERE reason IS NOT NULL""".stripMargin)
}
