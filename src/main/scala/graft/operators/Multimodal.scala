package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (LLM-data-pipeline extension family 3): media as an
  * opaque `binary` payload with a typed metadata struct, plus the decode /
  * feature-extract plumbing a real pipeline hangs a codec on.
  *
  * Two decode paths, both oracle-verifiable:
  *  - [[decodeFeatures]] (q25): a deterministic byte-slice stand-in over
  *    arbitrary payloads — schema, struct metadata, partition-parallel
  *    `mapPartitions` batching, and the per-partition amortization pattern
  *    (one MessageDigest per partition, like one decoder context per Arrow
  *    batch in a Pandas-UDF setup) with the oracle replaying every byte.
  *  - [[decodeImages]] (q66): a REAL image codec path — `javax.imageio`
  *    decoding a format-MIXED corpus (BMP and PNG payloads produced by
  *    [[imageTable]]), dispatched per row by the `format` column through
  *    the reader registry — in the same mapPartitions shape. Both
  *    containers are lossless, so the decoded pixel stream is
  *    oracle-reconstructible byte-for-byte from the generating arithmetic:
  *    the gate verifies true decoder output (dimensions + pixel digest)
  *    across BOTH codecs, not a simulation of one. Registering a JNI/FFmpeg
  *    reader for other codecs changes no plumbing.
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

  /** An image row: real encoded bytes (BMP or PNG container), nothing
    * synthetic downstream of here — consumers must run an actual codec. */
  final case class ImageRow(doc_id: Long, payload: Array[Byte], format: String)

  /** True decoder output: dimensions and a digest of the decoded pixel
    * raster (row-major, R,G,B per pixel), plus the container format the
    * dispatch decoded it from. */
  final case class ImageDecoded(doc_id: Long, format: String, img_w: Int,
                                img_h: Int, pixel_md5: String)

  /** Deterministic per-doc container: the corpus is format-MIXED (both
    * lossless, so the decoded raster — and therefore the oracle — is
    * format-independent; only the bytes on the wire differ). */
  def imageFormat(docId: Long): String = if (docId % 2 == 0) "bmp" else "png"

  /** Deterministic pixel channel value in [1,127] — single-byte UTF-8, so
    * the DuckDB oracle reassembles the exact decoded byte stream with
    * chr()/string_agg and hashes it (chr(0) is avoided: a NUL in a SQL
    * string is engine-dependent). All-positive inputs keep Scala's % and
    * SQL's % identical. */
  def pixelValue(docId: Long, x: Int, y: Int, c: Int): Int =
    ((docId * 31 + x * 7 + y * 13 + c * 5) % 127 + 1).toInt

  def imgW(docId: Long): Int = (docId % 6 + 2).toInt
  def imgH(docId: Long): Int = (docId % 4 + 2).toInt

  /** Build REAL image payloads: per doc, a tiny deterministic RGB bitmap
    * encoded through the actual `javax.imageio` writer for that doc's
    * [[imageFormat]] — the corpus mixes BMP and PNG containers (both
    * lossless, so an engine-independent oracle reproduces the decoded
    * bytes regardless of container). mapPartitions is the licensed
    * altitude here: an encoder is imperative per-row work with reusable
    * per-partition context, exactly the Pandas-UDF batch shape. */
  def imageTable(docs: DataFrame): Dataset[ImageRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      val bos = new java.io.ByteArrayOutputStream() // per-partition encoder buffer
      ids.map { id =>
        val w = imgW(id); val h = imgH(id)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y,
              (pixelValue(id, x, y, 0) << 16) |
              (pixelValue(id, x, y, 1) << 8) |
              pixelValue(id, x, y, 2))
            x += 1
          }
          y += 1
        }
        val fmt = imageFormat(id)
        bos.reset()
        if (!javax.imageio.ImageIO.write(img, fmt, bos))
          throw new IllegalStateException(s"no $fmt encoder for doc $id")
        ImageRow(id, bos.toByteArray, fmt)
      }
    }
  }

  /** The REAL decode, dispatched by the `format` column through the
    * `javax.imageio` READER REGISTRY: each partition looks the format's
    * `ImageReader` up once (`getImageReadersByFormatName`), caches it, and
    * reuses it row-to-row via `setInput` — a codec registry, not a
    * single-container special case; an unknown format or a corrupt payload
    * throws instead of passing garbage downstream. Same partition-parallel
    * batch shape as [[decodeFeatures]], same per-partition context
    * amortization (one MD5 instance + one reader per format). */
  def decodeImages(images: Dataset[ImageRow]): Dataset[ImageDecoded] = {
    import images.sparkSession.implicits._
    images.mapPartitions { rows =>
      val ctx = new DecodeContext
      rows.map { r =>
        ctx.decode(r) match {
          case Right((w, h, digest)) => ImageDecoded(r.doc_id, r.format, w, h, digest)
          case Left((NoDecoder, _)) =>
            throw new IllegalStateException(s"no decoder registered for format '${r.format}'")
          case Left((_, cause)) =>
            throw new IllegalStateException(
              s"undecodable ${r.format} payload, doc ${r.doc_id}", cause.orNull)
        }
      }
    }
  }

  /** Stable quarantine reason codes (never exception text — JDK-varying
    * messages would poison a deterministic gate and any groupBy on reason). */
  private[graft] val NoDecoder = "no_decoder_for_format"
  private[graft] val Undecodable = "undecodable_payload"

  /** The per-partition codec context both decode paths share: one MD5
    * instance, one lazily-resolved `ImageReader` per format (the
    * `javax.imageio` registry lookup), reused row-to-row via `setInput`.
    * `decode` returns the raster digest or a (reason, cause) pair — the
    * strict path throws on Left, the quarantining path emits a row. */
  private final class DecodeContext {
    private val md = MessageDigest.getInstance("MD5")
    private val readers =
      scala.collection.mutable.Map.empty[String, Option[javax.imageio.ImageReader]]

    private def readerFor(fmt: String): Option[javax.imageio.ImageReader] =
      readers.getOrElseUpdate(fmt, {
        val it = javax.imageio.ImageIO.getImageReadersByFormatName(fmt)
        if (it.hasNext) Some(it.next()) else None
      })

    def decode(r: ImageRow): Either[(String, Option[Exception]), (Int, Int, String)] =
      decodeRaster(r).map { case (w, h, px) =>
        md.reset()
        (w, h, hex(md.digest(px), upper = false))
      }

    /** The raw decoded raster (row-major R,G,B bytes) — for consumers that
      * compute on pixels (perceptual hashing) rather than digest them. */
    def decodeRaster(r: ImageRow): Either[(String, Option[Exception]), (Int, Int, Array[Byte])] =
      readerFor(r.format) match {
        case None => Left(NoDecoder -> None)
        case Some(reader) =>
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          try {
            reader.setInput(iis)
            Option(reader.read(0)) match {
              case None      => Left(Undecodable -> None)
              case Some(img) => Right(rasterBytes(img))
            }
          }
          catch { case e: Exception => Left(Undecodable -> Some(e)) }
          finally iis.close()
      }
  }

  /** Width, height, and row-major R,G,B bytes of the decoded raster. */
  private def rasterBytes(img: java.awt.image.BufferedImage): (Int, Int, Array[Byte]) = {
    val w = img.getWidth; val h = img.getHeight
    val px = new Array[Byte](w * h * 3)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        px(i) = ((rgb >> 16) & 0xFF).toByte
        px(i + 1) = ((rgb >> 8) & 0xFF).toByte
        px(i + 2) = (rgb & 0xFF).toByte
        i += 3; x += 1
      }
      y += 1
    }
    (w, h, px)
  }

  /** One perceptual hash per decoded image: [[perceptualHash]]'s row. */
  final case class ImagePHash(doc_id: Long, format: String, img_w: Int,
    img_h: Int, ahash: Long)

  /** Perceptual average-hash (aHash) over the REAL decoded raster — the
    * image-dedup primitive: per pixel, integer luminance r+g+b; bit (y·w+x)
    * is set iff the pixel is at-or-above the image's mean luminance,
    * decided by INTEGER cross-multiplication (lum·npixels ≥ total — no
    * division, no float, bit-reproducible anywhere). Identical content →
    * identical hash regardless of container (a BMP and a PNG of the same
    * pixels collide, which is the point); the corpus's rasters are ≤ 7×5,
    * so the bitmap fits one long directly — the production path downsamples
    * to 8×8 first and packs the same way. Decode reuses the per-partition
    * [[DecodeContext]] (one reader per format, reused row-to-row). */
  def perceptualHash(images: Dataset[ImageRow]): Dataset[ImagePHash] = {
    import images.sparkSession.implicits._
    images.mapPartitions { rows =>
      val ctx = new DecodeContext
      rows.map { r =>
        ctx.decodeRaster(r) match {
          case Right((w, h, px)) =>
            val npx = w * h
            require(npx <= 64, s"aHash bitmap needs <= 64 px (got $npx); downsample first")
            val lums = new Array[Long](npx)
            var total = 0L
            var i = 0
            while (i < npx) {
              lums(i) = (px(3 * i) & 0xFF).toLong + (px(3 * i + 1) & 0xFF) +
                (px(3 * i + 2) & 0xFF)
              total += lums(i)
              i += 1
            }
            var hash = 0L
            i = 0
            while (i < npx) {
              if (lums(i) * npx >= total) hash |= 1L << i
              i += 1
            }
            ImagePHash(r.doc_id, r.format, w, h, hash)
          case Left((reason, cause)) =>
            throw new IllegalStateException(
              s"undecodable ${r.format} payload, doc ${r.doc_id}: $reason", cause.orNull)
        }
      }
    }
  }

  /** A decode attempt: either true decoder output (`status = decoded`) or a
    * quarantine record (`status = quarantined`) with a STABLE machine reason
    * code ([[NoDecoder]]/[[Undecodable]]). */
  final case class ImageDecodeResult(doc_id: Long, format: String, status: String,
                                     img_w: Option[Int], img_h: Option[Int],
                                     pixel_md5: Option[String],
                                     quarantine_reason: Option[String])

  /** Quarantining decode: the identical [[DecodeContext]] dispatch as
    * [[decodeImages]], but an undecodable payload (or a format with no
    * registered reader) emits a quarantine ROW instead of failing the job —
    * the 100 TB media posture, where one corrupt blob among billions must
    * not kill a 1000-executor pass; the quarantine output is routed/audited
    * downstream (the binary analog of PERMISSIVE `_corrupt_record` JSON
    * ingest, JsonSource.scala). Still one partition-parallel pass, no
    * shuffle. */
  def decodeImagesQuarantine(images: Dataset[ImageRow]): Dataset[ImageDecodeResult] = {
    import images.sparkSession.implicits._
    images.mapPartitions { rows =>
      val ctx = new DecodeContext
      rows.map { r =>
        ctx.decode(r) match {
          case Right((w, h, digest)) =>
            ImageDecodeResult(r.doc_id, r.format, "decoded", Some(w), Some(h),
              Some(digest), None)
          case Left((reason, _)) =>
            ImageDecodeResult(r.doc_id, r.format, "quarantined", None, None, None,
              Some(reason))
        }
      }
    }
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
