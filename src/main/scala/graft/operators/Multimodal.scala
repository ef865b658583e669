package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (LLM-data-pipeline extension family 3): media as an
  * opaque `binary` payload with a typed metadata struct, plus the decode /
  * feature-extract plumbing a real pipeline hangs a codec on.
  *
  * The decode itself is a STUB — this container has no image/audio codecs —
  * but deliberately a *deterministic* one (header bytes, frame digests,
  * lengths), so the whole path is oracle-verifiable: schema, struct
  * metadata, partition-parallel `mapPartitions` batching, and the
  * per-partition amortization pattern (one MessageDigest per partition,
  * like one decoder context per Arrow batch in a Pandas-UDF setup) are all
  * real. Swapping `decodeOne` for a JNI/FFmpeg call changes no plumbing.
  */
object Multimodal {

  /** A media row: payload + typed metadata (what an ingest crawler emits). */
  final case class MediaRow(doc_id: Long, payload: Array[Byte],
                            width: Int, height: Int, channels: Int, format: String)

  /** Extracted features: fixed-width header, sampled "frame" digests, size.
    * (The frame sample at a stride mimics video frame-sampling; on text
    * payloads frames are byte slices.) */
  final case class MediaFeatures(doc_id: Long, byte_len: Long, codec_byte: Int,
                                 header_hex: String, frame0_md5: String,
                                 frame1_md5: String, frame2_md5: String)

  private val FrameStride = 101
  private val FrameLen = 64

  /** Build the media table from documents: binary payload (UTF-8 bytes of
    * the text — the opaque stand-in) + metadata struct derived from the
    * document row. Nested-struct projection (`meta.*`) is exercised by the
    * query layer. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        pmod(col("n_chars"), lit(640)).cast(IntegerType).as("width"),
        pmod(col("doc_id") * 7, lit(480)).cast(IntegerType).as("height"),
        lit(3).as("channels"),
        lit("fake/raw").as("format")).as("meta"))

  /** Frame sampling: one output row per sampled frame — the video
    * frame-sample shape (a generator, not an aggregate). Offsets step by
    * `stride` from byte 0, capped at `maxFrames` per document; each frame is
    * a `frameLen`-byte payload slice, digested. Declarative
    * (posexplode(sequence) + binary substring + md5), so it codegens and
    * splits across partitions like any projection; a real decoder would
    * replace the slice+digest with codec output, same plumbing. */
  def sampleFrames(media: DataFrame, stride: Int = FrameStride,
                   frameLen: Int = FrameLen, maxFrames: Int = 8,
                   carry: Seq[String] = Nil): DataFrame = {
    val lastIdx = least(
      floor((octet_length(col("payload")) - 1) / lit(stride)),
      lit(maxFrames - 1)).cast(IntegerType)
    media
      // An empty payload has NO frames. Without this filter lastIdx = -1
      // and sequence(0, -1) counts DOWN, yielding two phantom frames.
      .filter(octet_length(col("payload")) > 0)
      .select(Seq(col("doc_id"), col("payload")) ++ carry.map(col) :+
        posexplode(sequence(lit(0), lastIdx)): _*)
      .select(Seq(
        col("doc_id"),
        col("pos").as("frame_idx"),
        (col("pos") * stride).as("frame_off"),
        md5(col("payload").substr(col("pos") * stride + 1, lit(frameLen))).as("frame_md5")) ++
        carry.map(col): _*)
  }

  /** Resize stub: scales the metadata (integer-halved, floor 1) and passes
    * the payload through — a real resampler would transform the bytes; the
    * metadata contract and plumbing are what the engine owns. */
  def resizeMeta(w: Column, h: Column, factor: Int): (Column, Column) =
    (greatest(w.cast(IntegerType) / factor, lit(1)).cast(IntegerType),
     greatest(h.cast(IntegerType) / factor, lit(1)).cast(IntegerType))

  /** The decode stub: partition-parallel, batch-amortized. Exactly the
    * shape `mapInPandas` gives a Python decoder — an iterator of rows per
    * partition, expensive context (here the MD5 instance) created once. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5") // per-partition decoder context
      rows.map(r => decodeOne(md, r))
    }
  }

  private def hex(bytes: Array[Byte], upper: Boolean): String = {
    val fmt = if (upper) "%02X" else "%02x"
    bytes.map(fmt.format(_)).mkString
  }

  private def decodeOne(md: MessageDigest, r: MediaRow): MediaFeatures = {
    def frameMd5(i: Int): String = {
      val off = i * FrameStride
      val slice = r.payload.slice(off, math.min(off + FrameLen, r.payload.length))
      md.reset()
      hex(md.digest(slice), upper = false)
    }
    MediaFeatures(
      doc_id = r.doc_id,
      byte_len = r.payload.length.toLong,
      codec_byte = if (r.payload.nonEmpty) r.payload(0) & 0xFF else 0, // 0 = SQL ascii('')
      header_hex = hex(r.payload.take(8), upper = true),
      frame0_md5 = frameMd5(0),
      frame1_md5 = frameMd5(1),
      frame2_md5 = frameMd5(2))
  }
}
