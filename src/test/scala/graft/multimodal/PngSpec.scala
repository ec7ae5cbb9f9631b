package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The pure-JVM PNG codec: spec-level round-trips, corruption
  * detection, and — the strong check — a DIFFERENTIAL against the
  * JDK's own ImageIO PNG implementation in both directions (our
  * encoder's output read by ImageIO pixel-for-pixel, ImageIO's output
  * read by our decoder), proving real PNG-format compliance rather
  * than self-consistency.
  */
class PngSpec extends AnyFunSuite {

  private def dims(d: Long) = (24 + (d % 37).toInt, 16 + (d % 31).toInt)

  test("round-trip: decoded features equal the BMP codec's for the same pixels") {
    for (d <- Seq(0L, 1L, 7L, 36L, 123456L)) {
      val (w, h) = dims(d)
      val p = Png.decode(Png.encode(w, h, Bmp.pattern(d)))
      val b = Bmp.decode(Bmp.encode(w, h, Bmp.pattern(d)))
      assert((p.width, p.height) == (b.width, b.height))
      assert(p.dhash == b.dhash, s"d=$d dhash diverged")
      assert(math.abs(p.meanR - b.meanR) < 1e-12 &&
        math.abs(p.meanG - b.meanG) < 1e-12 &&
        math.abs(p.meanB - b.meanB) < 1e-12, s"d=$d channel means diverged")
    }
  }

  test("our PNGs are REAL PNGs: ImageIO reads them pixel-for-pixel") {
    val (w, h, d) = (37, 23, 99L) // ≥5 rows: every filter type used
    val bytes = Png.encode(w, h, Bmp.pattern(d))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO rejected our PNG outright")
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = Bmp.pattern(d)(x, y)
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff) == (r, g, b),
        s"pixel ($x,$y) diverged")
    }
  }

  test("our decoder reads ImageIO's PNGs (foreign filter/zlib choices)") {
    val (w, h, d) = (31, 19, 5L)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = Bmp.pattern(d)(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    val dec = Png.decode(out.toByteArray)
    val ref = Bmp.decode(Bmp.encode(w, h, Bmp.pattern(d)))
    assert((dec.width, dec.height) == (w, h))
    assert(dec.dhash == ref.dhash && math.abs(dec.meanR - ref.meanR) < 1e-12)
  }

  test("corruption fails loudly: CRC, truncation, bad magic") {
    val bytes = Png.encode(16, 16, Bmp.pattern(1L))
    // flip one byte inside the first IDAT's payload → CRC mismatch
    val corrupt = bytes.clone()
    val idatAt = {
      var i = 8
      def typ(o: Int) = new String(corrupt, o + 4, 4, "US-ASCII")
      def len(o: Int) = java.nio.ByteBuffer.wrap(corrupt, o, 4).getInt
      while (typ(i) != "IDAT") i += 12 + len(i)
      i
    }
    corrupt(idatAt + 8) = (corrupt(idatAt + 8) ^ 0x55).toByte
    val e = intercept[IllegalArgumentException] { Png.decode(corrupt) }
    assert(e.getMessage.contains("CRC"))
    intercept[IllegalArgumentException] { Png.decode(bytes.take(40)) }
    val notPng = bytes.clone(); notPng(0) = 'X'.toByte
    assert(intercept[IllegalArgumentException] { Png.decode(notPng) }
      .getMessage.contains("magic"))
  }

  test("a truncated zlib stream behind VALID chunk CRCs fails, not hangs") {
    // cut the deflate stream short but recompute the chunk CRC — the
    // per-chunk integrity check passes, so only the inflate loop can
    // catch it; before the needsInput guard this spun forever
    val bytes = Png.encode(16, 16, Bmp.pattern(2L))
    val out = new java.io.ByteArrayOutputStream()
    out.write(bytes, 0, 8)
    var pos = 8
    var cut = false
    while (pos < bytes.length) {
      val len = java.nio.ByteBuffer.wrap(bytes, pos, 4).getInt
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      if (typ == "IDAT" && !cut) {
        val keep = math.max(1, len / 2)
        val crc = new java.util.zip.CRC32()
        crc.update(bytes, pos + 4, 4 + keep)
        out.write(java.nio.ByteBuffer.allocate(4).putInt(keep).array())
        out.write(bytes, pos + 4, 4 + keep)
        out.write(java.nio.ByteBuffer.allocate(4)
          .putInt(crc.getValue.toInt).array())
        cut = true
      } else if (typ != "IDAT") out.write(bytes, pos, 12 + len)
      pos += 12 + len
    }
    val e = intercept[IllegalArgumentException] { Png.decode(out.toByteArray) }
    assert(e.getMessage.contains("truncated"))
  }

  test("unsupported shapes are rejected, not mis-decoded") {
    // grayscale from ImageIO → color type 0 → loud rejection
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val e = intercept[IllegalArgumentException] { Png.decode(out.toByteArray) }
    assert(e.getMessage.contains("truecolor"))
  }
}
