package graft.operators

import Multimodal.{DecodedImage, ImageDecoder}

/** REAL decoders behind the [[Multimodal.ImageDecoder]] seam (S4): the
  * stub exists only because this container ships no native image
  * library; these two are pure-JVM and fully real, promoted from the
  * spec to the library (r10) so the BENCH and the streaming soak can
  * drive genuine decode work:
  *
  *   - [[PpmDecoder]]: a complete hand-rolled binary-PPM (P6) parser —
  *     header + raw RGB planes;
  *   - [[ImageIoDecoder]]: the JDK's own `javax.imageio` codec set
  *     (PNG, JPEG, BMP, GIF — whatever the running JDK registers).
  *
  * Top-level objects (never spec inner classes): decoders ship to
  * executors and must not capture a test class in their closure.
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
