package graft

import graft.operators.Multimodal

/** The real-codec path (q66): javax.imageio must round-trip the
  * deterministic bitmaps losslessly, and the decoder must refuse garbage
  * rather than pass it downstream. */
class MultimodalSpec extends SparkSpec {

  test("imageTable -> decodeImages round-trips BOTH containers losslessly (BMP and PNG)") {
    import spark.implicits._
    // even ids encode BMP, odd ids PNG — the mixed corpus exercises the
    // registry dispatch inside one partition set
    val docs = Seq(0L, 1L, 5L, 11L, 12L).toDF("doc_id")
    val out = Multimodal.decodeImages(Multimodal.imageTable(docs))
      .collect().map(d => d.doc_id -> d).toMap

    out.keySet shouldBe Set(0L, 1L, 5L, 11L, 12L)
    out.values.map(_.format).toSet shouldBe Set("bmp", "png")
    out.foreach { case (id, d) =>
      d.format shouldBe Multimodal.imageFormat(id)
      d.img_w shouldBe Multimodal.imgW(id)
      d.img_h shouldBe Multimodal.imgH(id)
      // digest of the generating pixel stream == digest of the DECODED one
      val px = for {
        y <- 0 until d.img_h; x <- 0 until d.img_w; c <- 0 until 3
      } yield Multimodal.pixelValue(id, x, y, c).toByte
      val md = java.security.MessageDigest.getInstance("MD5")
      val want = md.digest(px.toArray).map("%02x".format(_)).mkString
      d.pixel_md5 shouldBe want
    }
  }

  test("the format column drives the codec: a PNG payload labeled bmp must not decode") {
    import spark.implicits._
    // encode doc 3 (an odd id -> PNG bytes), then mislabel it as BMP: the
    // dispatched BMP reader must reject it — proof the registry dispatch is
    // real and not content sniffing that ignores the column
    val png = Multimodal.imageTable(Seq(3L).toDF("doc_id")).collect().head
    png.format shouldBe "png"
    val mislabeled = Seq(Multimodal.ImageRow(3L, png.payload, "bmp")).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImages(mislabeled).collect()
    }
    e.getMessage should include("undecodable")
  }

  test("decodeImages throws on an undecodable payload instead of emitting garbage") {
    import spark.implicits._
    val bogus = Seq(Multimodal.ImageRow(7L, Array[Byte](1, 2, 3, 4), "bmp")).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImages(bogus).collect()
    }
    e.getMessage should include("undecodable")
  }

  test("quarantining decode routes corrupt payloads to quarantine rows, job survives") {
    import spark.implicits._
    val clean = Multimodal.imageTable(Seq(2L, 3L, 4L).toDF("doc_id"))
    // inject: doc 2 truncated (undecodable container), doc 3 relabeled to a
    // format with no reader; doc 4 untouched
    val damaged = clean.map { r =>
      if (r.doc_id == 2L) r.copy(payload = r.payload.take(8))
      else if (r.doc_id == 3L) r.copy(format = "glyph9")
      else r
    }
    val out = Multimodal.decodeImagesQuarantine(damaged)
      .collect().map(d => d.doc_id -> d).toMap

    out(2L).status shouldBe "quarantined"
    out(2L).quarantine_reason shouldBe Some("undecodable_payload")
    out(2L).pixel_md5 shouldBe None
    out(3L).status shouldBe "quarantined"
    out(3L).quarantine_reason shouldBe Some("no_decoder_for_format")
    // the healthy doc still produces TRUE decoder output in the same pass
    out(4L).status shouldBe "decoded"
    out(4L).quarantine_reason shouldBe None
    out(4L).img_w shouldBe Some(Multimodal.imgW(4L))
    out(4L).img_h shouldBe Some(Multimodal.imgH(4L))
    val px = for {
      y <- 0 until Multimodal.imgH(4L); x <- 0 until Multimodal.imgW(4L); c <- 0 until 3
    } yield Multimodal.pixelValue(4L, x, y, c).toByte
    val md = java.security.MessageDigest.getInstance("MD5")
    out(4L).pixel_md5 shouldBe Some(md.digest(px.toArray).map("%02x".format(_)).mkString)
  }

  test("decodeImages refuses a format with no registered reader") {
    import spark.implicits._
    val unknown = Seq(Multimodal.ImageRow(9L, Array[Byte](1, 2), "webp2050")).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImages(unknown).collect()
    }
    e.getMessage should include("no decoder registered")
  }
}
