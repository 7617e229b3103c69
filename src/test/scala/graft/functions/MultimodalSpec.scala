package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.Multimodal._

/** The multimodal plumbing: deterministic stub decode, resize striding,
  * frame sampling boundaries, and the mapPartitions featurize pass against
  * hand-computed values.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("decodeStub is deterministic and normalized") {
    val bytes = Array[Byte](0, 127, -1, -128)
    val px = decodeStub(bytes)
    assert(px.toSeq == Seq(0.0f, 127 / 255.0f, 1.0f, 128 / 255.0f))
    assert(decodeStub(bytes).toSeq == px.toSeq)
  }

  test("resizeStub strides uniformly and handles empty input") {
    val px = Array.tabulate(10)(_.toFloat)
    assert(resizeStub(px, 5).toSeq == Seq(0f, 2f, 4f, 6f, 8f))
    assert(resizeStub(px, 10).toSeq == px.toSeq)
    assert(resizeStub(px, 3).length == 3)
    // upsample repeats neighbours, never overflows
    assert(resizeStub(Array(1f, 2f), 4).toSeq == Seq(1f, 1f, 2f, 2f))
    assert(resizeStub(Array.empty[Float], 4).toSeq == Seq(0f, 0f, 0f, 0f))
  }

  test("sampleFrames: fixed frames, stride, short tail") {
    val content = Array.tabulate(FrameBytes * 2 + 100)(_.toByte)
    val all = sampleFrames(content, 1)
    assert(all.length == 3)
    assert(all(0).length == FrameBytes && all(1).length == FrameBytes)
    assert(all(2).length == 100)
    assert(all(0).toSeq == content.slice(0, FrameBytes).toSeq)
    val strided = sampleFrames(content, 2)
    assert(strided.length == 2)
    assert(strided(1).toSeq == content.slice(2 * FrameBytes, 2 * FrameBytes + 100).toSeq)
    assert(sampleFrames(Array.empty[Byte], 1).isEmpty)
  }

  test("featurize computes digest/frames/stats through mapPartitions") {
    val s = spark; import s.implicits._
    val contentA = "hello multimodal world".getBytes("UTF-8")
    val contentB = Array.fill[Byte](FrameBytes + 1)(65) // 'A' x 1025
    val media = Seq(
      MediaRow(1L, MediaMeta("image", 2, 2, 1, 0), contentA),
      MediaRow(2L, MediaMeta("audio", 0, 0, 0, 16000), contentB),
      MediaRow(3L, MediaMeta("video", 0, 0, 9, 0), Array.empty[Byte]))
      .toDS().repartition(2)
    val out = featurize(media).collect().map(f => f.id -> f).toMap

    def md5hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map("%02x".format(_)).mkString

    assert(out(1L).nBytes == contentA.length.toLong)
    assert(out(1L).nFrames == 1L)
    assert(out(1L).contentMd5 == md5hex(contentA))
    assert(out(1L).mediaType == "image")

    assert(out(2L).nBytes == (FrameBytes + 1).toLong)
    assert(out(2L).nFrames == 2L)
    // constant content: zero entropy, mean = 65/255
    assert(out(2L).entropy == 0.0)
    assert(math.abs(out(2L).meanValue - 65 / 255.0) < 1e-6)

    assert(out(3L).nBytes == 0L && out(3L).nFrames == 0L)
    assert(out(3L).entropy == 0.0 && out(3L).meanValue == 0.0)
    assert(out(3L).contentMd5 == md5hex(Array.empty[Byte]))
  }

  test("encodeGrayPng -> decodeImage round-trips geometry and every pixel") {
    val png = encodeGrayPng(7, 3, 200)
    val d = decodeImage(png).get
    assert(d.width == 7 && d.height == 3 && d.bands == 1)
    assert(d.samples.length == 21)
    assert(d.samples.forall(_ == 200 / 255.0f))
    // non-constant image: pixel order is row-major
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 2; x <- 0 until 2)
      img.getRaster.setSample(x, y, 0, y * 2 + x) // 0,1 / 2,3
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val d2 = decodeImage(bos.toByteArray).get
    assert(d2.samples.toSeq == Seq(0, 1, 2, 3).map(_ / 255.0f))
  }

  test("decodeImage: None on non-image bytes; decode() falls back to the stub") {
    val junk = "definitely not an image".getBytes("UTF-8")
    assert(decodeImage(junk).isEmpty)
    assert(decode(junk).toSeq == decodeStub(junk).toSeq)
    // and a real PNG takes the ImageIO path (stub would see ~90 header bytes)
    val png = encodeGrayPng(4, 4, 128)
    assert(decode(png).length == 16)
  }

  test("featurizeImages: ImageIO path for PNGs, stub fallback flagged for other bytes") {
    val s = spark; import s.implicits._
    val media = Seq(
      MediaRow(1L, MediaMeta("image/png", 10, 5, 1, 0), encodeGrayPng(10, 5, 51)),
      MediaRow(2L, MediaMeta("audio", 0, 0, 0, 8000), Array.fill[Byte](64)(65)))
      .toDS().repartition(2)
    val out = featurizeImages(media).collect().map(f => f.id -> f).toMap
    assert(out(1L).decoded && out(1L).width == 10 && out(1L).height == 5 &&
      out(1L).bands == 1)
    assert(math.abs(out(1L).meanValue - 51 / 255.0) < 1e-6)
    assert(!out(2L).decoded && out(2L).width == -1 && out(2L).height == -1)
    assert(math.abs(out(2L).meanValue - 65 / 255.0) < 1e-6)
  }
}
