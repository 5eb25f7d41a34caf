package graft.operators

import graft.SparkSpec
import Multimodal.{ImageDecoder, MediaRow}

/** [[PpmDecoder]] / [[ImageIoDecoder]] (library codecs since r10 —
  * `operators/RealCodecs.scala`) exercised through the
  * [[Multimodal.ImageDecoder]] seam (S4): prove the trait boundary
  * admits real implementations with zero engine changes.
  */
class RealCodecSpec extends SparkSpec {
  import spark.implicits._

  // 2×2 RGB test image: pixel(y,x) channel bytes 10..120
  private val pixelBytes = Array.tabulate[Byte](12)(i => ((i + 1) * 10).toByte)

  private def ppmPayload: Array[Byte] = {
    val header = "P6\n2 2\n255\n".getBytes("US-ASCII")
    header ++ pixelBytes
  }

  private def pngPayload: Array[Byte] = {
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 2) {
      val i = (y * 2 + x) * 3
      img.setRGB(x, y, ((pixelBytes(i) & 0xff) << 16) |
        ((pixelBytes(i + 1) & 0xff) << 8) | (pixelBytes(i + 2) & 0xff))
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out), "no PNG writer")
    out.toByteArray
  }

  private def assertFeatures(payload: Array[Byte],
      decoder: ImageDecoder): Unit = {
    val media = Seq(MediaRow(1L, payload), MediaRow(2L, payload))
      .toDS()
    val feats = Multimodal.extractFeatures(media, decoder)
      .collect().sortBy(_.doc_id)
    assert(feats.length === 2)
    val f = feats.head
    assert(f.width === 2 && f.height === 2 && f.channels === 3)
    // mean over all 12 channel bytes: (10+20+...+120)/12
    assert(f.mean_intensity === 65.0)
    // 8×8 avg-pool with 1-px cells: top-left 2×2 holds the R channel,
    // out-of-image cells pool to zero
    assert(f.thumb_8x8(0) === 10.0 && f.thumb_8x8(1) === 40.0)
    assert(f.thumb_8x8(8) === 70.0 && f.thumb_8x8(9) === 100.0)
    assert(f.thumb_8x8.zipWithIndex
      .filterNot { case (_, i) => Set(0, 1, 8, 9)(i) }
      .forall(_._1 === 0.0))
  }

  test("hand-rolled PPM codec slots through the decoder seam unchanged") {
    assertFeatures(ppmPayload, PpmDecoder)
  }

  test("the JDK's javax.imageio PNG codec slots through the seam too") {
    assertFeatures(pngPayload, ImageIoDecoder)
  }

  test("decoders agree: identical features from PPM and PNG of one image") {
    val media = Seq(MediaRow(1L, ppmPayload)).toDS()
    val viaPpm = Multimodal.extractFeatures(media, PpmDecoder).collect().head
    val mediaPng = Seq(MediaRow(1L, pngPayload)).toDS()
    val viaPng = Multimodal.extractFeatures(mediaPng, ImageIoDecoder)
      .collect().head
    assert(viaPpm.width === viaPng.width)
    assert(viaPpm.height === viaPng.height)
    assert(viaPpm.mean_intensity === viaPng.mean_intensity)
    assert(viaPpm.thumb_8x8.toSeq === viaPng.thumb_8x8.toSeq)
  }
}
