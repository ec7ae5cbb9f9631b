package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Uncompressed 24-bit BMP codec in pure JVM code — the image half of
  * the real multimodal decode path (see [[Wav]] for the rationale).
  * The decoder handles the format's genuine quirks: BGR byte order,
  * 4-byte row padding, and bottom-up vs top-down row storage (sign of
  * the declared height). On top of the decoded pixels it computes the
  * features an image-curation pipeline actually uses: per-channel
  * means, an 8×8 nearest-neighbor luma thumbnail (the "resize" stage,
  * real this time), and a 56-bit difference hash — the standard
  * perceptual near-duplicate key for images, making image dedup the
  * same banded-join shape as d03/d04 text dedup.
  */
object Bmp {

  final case class Decoded(width: Int, height: Int, topDown: Boolean,
      meanR: Double, meanG: Double, meanB: Double, dhash: Long)

  /** Encode a 24bpp bottom-up BMP. `rgb(x, y)` returns (r, g, b) for
    * the pixel at column x, row y (y = 0 is the TOP row — the encoder
    * handles the bottom-up storage).
    */
  def encode(width: Int, height: Int,
      rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width >= 1 && height >= 1, s"bad dimensions ${width}x$height")
    val rowBytes = width * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataSize = (rowBytes + pad) * height
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(54 + dataSize).putShort(0).putShort(0).putInt(54)
    buf.putInt(40) // BITMAPINFOHEADER
      .putInt(width).putInt(height) // positive height = bottom-up
      .putShort(1).putShort(24)     // planes, bpp
      .putInt(0)                    // BI_RGB (uncompressed)
      .putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1 // bottom-up: last image row first in the file
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte) // BGR on disk
        x += 1
      }
      var p = 0
      while (p < pad) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Integer luma (the SQL-replicable fixed-point BT.601 form). */
  private def luma(r: Int, g: Int, b: Int): Int = (299 * r + 587 * g + 114 * b) / 1000

  /** Decode a 24bpp uncompressed BMP and compute features. Validates
    * the BM magic, header sizes, bit depth, and compression; honors
    * row padding and both row orders. The 8×8 thumbnail samples pixel
    * (x_j, y_i) = (j·W/8, i·H/8) (integer floor — deterministic,
    * SQL-replicable); the dhash packs, row-major, bit (i·7+j) =
    * [luma(x_{j+1}, y_i) > luma(x_j, y_i)] for j < 7 — 56 bits, kept
    * under the sign bit so the key stays an ordinary positive BIGINT
    * in every engine.
    */
  def decode(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 54, s"not a BMP: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.get() == 'B'.toByte && buf.get() == 'M'.toByte,
      "bad magic: not a BMP")
    buf.getInt; buf.getShort; buf.getShort
    val dataOff = buf.getInt
    val hdrSize = buf.getInt
    require(hdrSize >= 40, s"unsupported DIB header size $hdrSize")
    val width = buf.getInt
    val rawHeight = buf.getInt
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    buf.getShort // planes
    val bpp = buf.getShort.toInt
    require(bpp == 24, s"only 24bpp supported, got $bpp")
    val compression = buf.getInt
    require(compression == 0, s"only uncompressed (BI_RGB) supported, got $compression")
    require(width >= 1 && height >= 1, s"bad dimensions ${width}x$height")
    val rowBytes = width * 3
    val stride = rowBytes + (4 - rowBytes % 4) % 4
    require(dataOff + stride.toLong * height <= bytes.length,
      s"truncated BMP: need ${dataOff + stride.toLong * height} bytes, have ${bytes.length}")
    // pixel accessor in image coordinates (y = 0 at the top)
    def px(x: Int, y: Int): (Int, Int, Int) = {
      val fileRow = if (topDown) y else height - 1 - y
      val o = dataOff + fileRow * stride + x * 3
      ((bytes(o + 2) & 0xff), (bytes(o + 1) & 0xff), (bytes(o) & 0xff))
    }
    var sr, sg, sb = 0L
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = px(x, y)
        sr += r; sg += g; sb += b
        x += 1
      }
      y += 1
    }
    val n = width.toLong * height
    var dhash = 0L
    var i = 0
    while (i < 8) {
      val yy = i * height / 8
      var j = 0
      while (j < 7) {
        val (r0, g0, b0) = px(j * width / 8, yy)
        val (r1, g1, b1) = px((j + 1) * width / 8, yy)
        if (luma(r1, g1, b1) > luma(r0, g0, b0)) dhash |= 1L << (i * 7 + j)
        j += 1
      }
      i += 1
    }
    Decoded(width, height, topDown,
      sr.toDouble / n, sg.toDouble / n, sb.toDouble / n, dhash)
  }

  /** Deterministic linear-congruential test pattern: pixel (x, y) of
    * document d is (r, g, b) = ((3x+7y+d) mod 256, (5x+11y+2d) mod 256,
    * (13x+17y+3d) mod 256). Integer arithmetic end-to-end, so a SQL
    * oracle replicates every decoded feature — mean channels AND the
    * sampled-thumbnail dhash — without touching the bytes; hash
    * equality then proves encoder, decoder, resize, and hash compose
    * exactly.
    */
  def pattern(d: Long)(x: Int, y: Int): (Int, Int, Int) = (
    java.lang.Math.floorMod(3L * x + 7L * y + d, 256L).toInt,
    java.lang.Math.floorMod(5L * x + 11L * y + 2L * d, 256L).toInt,
    java.lang.Math.floorMod(13L * x + 17L * y + 3L * d, 256L).toInt)
}
