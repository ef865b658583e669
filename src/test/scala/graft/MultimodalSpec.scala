package graft

import graft.operators.Multimodal

/** The real-codec path (q66): javax.imageio must round-trip the
  * deterministic bitmaps losslessly, and the decoder must refuse garbage
  * rather than pass it downstream. */
class MultimodalSpec extends SparkSpec {

  test("imageTable -> decodeImages is a lossless real-codec round-trip") {
    import spark.implicits._
    val docs = Seq(0L, 1L, 5L, 11L).toDF("doc_id")
    val out = Multimodal.decodeImages(Multimodal.imageTable(docs))
      .collect().map(d => d.doc_id -> d).toMap

    out.keySet shouldBe Set(0L, 1L, 5L, 11L)
    out.foreach { case (id, d) =>
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

  test("decodeImages throws on an undecodable payload instead of emitting garbage") {
    import spark.implicits._
    val bogus = Seq(Multimodal.ImageRow(7L, Array[Byte](1, 2, 3, 4), "bmp")).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImages(bogus).collect()
    }
    e.getMessage should include("undecodable")
  }
}
