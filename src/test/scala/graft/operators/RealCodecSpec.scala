package graft.operators

import graft.SparkSpec
import Multimodal.{DecodedImage, ImageDecoder, MediaRow}

/** A REAL decoder through the [[Multimodal.ImageDecoder]] seam (S4): the
  * stub exists only because this container ships no image library, so
  * prove the trait boundary actually admits a real implementation with
  * zero engine changes. Two real codecs, both pure JVM:
  *
  *   - [[PpmDecoder]]: a complete hand-rolled binary-PPM (P6) parser —
  *     header + raw RGB planes, nothing fake about it;
  *   - [[ImageIoDecoder]]: the JDK's own `javax.imageio` PNG codec.
  *
  * Top-level objects (not spec inner classes) because decoders ship to
  * executors and must not capture the test class in their closure.
  */
object PpmDecoder extends ImageDecoder {
  override def decode(payload: Array[Byte]): DecodedImage = {
    // header: "P6" <w> <h> <maxval> single-whitespace, then raw RGB
    var pos = 0
    def token(): String = {
      while (payload(pos).toChar.isWhitespace) pos += 1
      val start = pos
      while (pos < payload.length && !payload(pos).toChar.isWhitespace)
        pos += 1
      new String(payload, start, pos - start, "US-ASCII")
    }
    require(token() == "P6", "not a binary PPM")
    val width = token().toInt
    val height = token().toInt
    require(token().toInt == 255, "only 8-bit PPM supported")
    pos += 1 // the single whitespace after maxval
    val n = width * height * 3
    require(payload.length - pos >= n, "truncated PPM payload")
    DecodedImage(width, height, 3,
      java.util.Arrays.copyOfRange(payload, pos, pos + n))
  }
}

object ImageIoDecoder extends ImageDecoder {
  override def decode(payload: Array[Byte]): DecodedImage = {
    val img = javax.imageio.ImageIO
      .read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "javax.imageio could not decode the payload")
    val (w, h) = (img.getWidth, img.getHeight)
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val i = (y * w + x) * 3
        px(i) = ((rgb >> 16) & 0xff).toByte
        px(i + 1) = ((rgb >> 8) & 0xff).toByte
        px(i + 2) = (rgb & 0xff).toByte
        x += 1
      }
      y += 1
    }
    DecodedImage(w, h, 3, px)
  }
}

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
