package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import graft.SparkSpec

/** The pure-JVM media codecs behind m03/m04: real parsing quirks
  * (chunk walking, padding, row order), loud failure on corrupt input,
  * and the dhash near-dup property.
  */
class MediaCodecSpec extends SparkSpec {

  test("WAV round-trip: format fields and features survive encode/decode") {
    val samples = Wav.squareWave(amplitude = 1200, nFrames = 400,
      channels = 2, period = 16)
    val bytes = Wav.encode(samples, channels = 2, sampleRate = 8000)
    assert(bytes.length == 44 + 400 * 2 * 2)
    val d = Wav.decode(bytes)
    assert(d.channels == 2 && d.sampleRate == 8000 && d.bits == 16)
    assert(d.nFrames == 400 && d.durationMs == 50)
    assert(d.peak == 1200 && d.rms == 1200.0) // ±A squares to A² exactly
    // zero crossings: channel-0 flips at every multiple of the period
    assert(d.transitions == (400 - 1) / 16)
  }

  test("zero-crossing count matches the waveform's closed form") {
    // interleaving must not leak channel 1 into channel 0's crossings
    for ((frames, ch, period) <- Seq((300, 1, 6), (316, 2, 7), (653, 2, 18))) {
      val d = Wav.decode(Wav.encode(
        Wav.squareWave(900, frames, ch, period), ch, 8000))
      assert(d.transitions == (frames - 1) / period,
        s"frames=$frames ch=$ch period=$period")
    }
    // silence (amplitude 0) never crosses: zero counts as non-negative
    val s = Wav.decode(Wav.encode(Wav.squareWave(0, 200, 1, 4), 1, 8000))
    assert(s.transitions == 0)
  }

  test("WAV decoder walks unknown chunks by declared size") {
    val base = Wav.encode(Wav.squareWave(500, 100, 1, 8), 1, 8000)
    // splice a 6-byte "LIST" chunk (odd->padded handling via even size
    // here; oddSize below) between "WAVE" and "fmt "
    val extra = ByteBuffer.allocate(14).order(ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes("US-ASCII")).putInt(6)
      .put(Array[Byte](1, 2, 3, 4, 5, 6)).array()
    val spliced = base.take(12) ++ extra ++ base.drop(12)
    // fix the RIFF size field
    ByteBuffer.wrap(spliced).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8)
    val d = Wav.decode(spliced)
    assert(d.nFrames == 100 && d.peak == 500)
    // odd-size unknown chunk: the 2-byte alignment pad must be honored
    val odd = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
      .put("junk".getBytes("US-ASCII")).putInt(3)
      .put(Array[Byte](9, 9, 9, 0)).array() // 3 data + 1 alignment pad
    val spliced2 = base.take(12) ++ odd ++ base.drop(12)
    ByteBuffer.wrap(spliced2).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced2.length - 8)
    assert(Wav.decode(spliced2).nFrames == 100)
  }

  test("WAV decoder fails loudly on corrupt input") {
    val good = Wav.encode(Wav.squareWave(500, 100, 1, 8), 1, 8000)
    assert(intercept[IllegalArgumentException] {
      Wav.decode("not a riff file at all".getBytes)
    }.getMessage.contains("magic"))
    // truncated mid-data: the data chunk declares more than remains
    assert(intercept[IllegalArgumentException] {
      Wav.decode(good.take(good.length - 10))
    }.getMessage.contains("truncated"))
    // non-PCM format code
    val bad = good.clone()
    ByteBuffer.wrap(bad).order(ByteOrder.LITTLE_ENDIAN).putShort(20, 7)
    assert(intercept[IllegalArgumentException] {
      Wav.decode(bad)
    }.getMessage.contains("PCM"))
  }

  test("BMP round-trip honors padding and bottom-up rows") {
    // width 25 -> rowBytes 75 -> pad 1: exercises the padding branch
    val bytes = Bmp.encode(25, 3, (x, y) => (x % 256, y * 40 % 256, 7))
    assert(bytes.length == 54 + (75 + 1) * 3)
    val d = Bmp.decode(bytes)
    assert(d.width == 25 && d.height == 3 && !d.topDown)
    // mean of x over 0..24 = 12; y*40 over rows 0,1,2 = 40; b constant
    assert(math.abs(d.meanR - 12.0) < 1e-9)
    assert(math.abs(d.meanG - 40.0) < 1e-9)
    assert(d.meanB == 7.0)
  }

  test("BMP decoder reads top-down files identically to bottom-up") {
    val w = 9; val h = 4
    def rgb(x: Int, y: Int) = ((x * 20) % 256, (y * 50) % 256, (x + y) % 256)
    val up = Bmp.decode(Bmp.encode(w, h, rgb))
    // hand-build the top-down variant: negative height, rows in image order
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    val buf = ByteBuffer.allocate(54 + (rowBytes + pad) * h)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(buf.capacity).putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(-h).putShort(1).putShort(24)
      .putInt(0).putInt((rowBytes + pad) * h)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (y <- 0 until h) {
      for (x <- 0 until w) {
        val (r, g, b) = rgb(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
      }
      (0 until pad).foreach(_ => buf.put(0.toByte))
    }
    val down = Bmp.decode(buf.array())
    assert(down.topDown)
    assert((down.meanR, down.meanG, down.meanB, down.dhash) ==
      (up.meanR, up.meanG, up.meanB, up.dhash))
  }

  test("BMP decoder fails loudly on corrupt input") {
    assert(intercept[IllegalArgumentException] {
      Bmp.decode(Array.fill[Byte](60)(0))
    }.getMessage.contains("magic"))
    val good = Bmp.encode(8, 8, Bmp.pattern(1L))
    assert(intercept[IllegalArgumentException] {
      Bmp.decode(good.take(80))
    }.getMessage.contains("truncated"))
  }

  test("dhash is a perceptual near-dup key: stable under tiny edits, distinct across images") {
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = Bmp.decode(Bmp.encode(40, 30, Bmp.pattern(5L))).dhash
    // one-pixel edit away from a sampled point: hash unchanged or near
    val edited = Bmp.decode(Bmp.encode(40, 30, (x, y) =>
      if (x == 17 && y == 11) (255, 255, 255) else Bmp.pattern(5L)(x, y))).dhash
    assert(hamming(base, edited) <= 2)
    // a different pattern is far away
    val other = Bmp.decode(Bmp.encode(40, 30, Bmp.pattern(999L))).dhash
    assert(hamming(base, other) > 8)
  }

  test("media features match their closed forms on real docs (m03/m04 shape)") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, sfDir).limit(50)
    val wav = MediaFeatures.wavFeatures(docs)
      .select("doc_id", "peak", "rms", "n_frames").collect()
    wav.foreach { r =>
      val d = r.getLong(0)
      val a = (1000L + (d * 37L) % 20000L).toInt
      assert(r.getInt(1) == a && r.getDouble(2) == a.toDouble)
    }
    val img = MediaFeatures.imageFeatures(docs)
      .select(col("doc_id"), col("width"), col("height")).collect()
    img.foreach { r =>
      val d = r.getLong(0)
      assert(r.getInt(1) == 24 + (d % 41).toInt)
      assert(r.getInt(2) == 16 + (d % 29).toInt)
    }
  }
}
