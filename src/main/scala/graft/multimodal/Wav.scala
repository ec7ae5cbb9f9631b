package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** RIFF/PCM WAV codec in pure JVM code — a REAL decode path for the
  * multimodal pipeline. The container ships no codec libraries, so the
  * codec-free container formats (RIFF PCM here, uncompressed BMP in
  * [[Bmp]]) demonstrate the genuine byte-level decode stage end-to-end:
  * magic validation, chunk walking (unknown chunks skipped by their
  * declared size, like every real RIFF reader must), interleaved-sample
  * demux, and feature extraction over the decoded PCM. A compressed
  * format would slot behind the same `mapPartitions` interface with a
  * JNI/ffmpeg decoder; nothing else in the pipeline changes.
  *
  * The reference pipeline has no audio surface; this is part of the
  * mandated LLM-training-data additions (multimodal columns).
  */
object Wav {

  /** Decoded PCM summary: format fields straight from the `fmt ` chunk,
    * frame count from the `data` chunk, and features computed over the
    * samples (peak = max |sample|, rms = sqrt(mean(sample^2)) across all
    * channels; transitions = channel-0 sign changes — the zero-crossing
    * count, the classic O(1)-state pitch/periodicity feature and the
    * basis of the m06 audio fingerprint).
    */
  final case class Decoded(channels: Int, sampleRate: Int, bits: Int,
      nFrames: Long, durationMs: Long, peak: Int, rms: Double,
      transitions: Int)

  /** Encode 16-bit PCM frames as a canonical RIFF/WAVE byte stream
    * (little-endian, `fmt ` then `data`). `samples` is interleaved
    * frame-major: frame i's channel c at `samples(i * channels + c)`.
    */
  def encode(samples: Array[Short], channels: Int, sampleRate: Int): Array[Byte] = {
    require(channels >= 1, "channels must be >= 1")
    require(samples.length % channels == 0,
      s"${samples.length} samples do not divide into $channels channels")
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  private def fourCC(b: ByteBuffer): String = {
    val a = new Array[Byte](4)
    b.get(a)
    new String(a, "US-ASCII")
  }

  /** Decode a RIFF/WAVE byte stream: validates the RIFF/WAVE magic,
    * walks chunks by declared size (skipping ones it does not know,
    * honoring RIFF's 2-byte chunk alignment), requires 16-bit
    * uncompressed PCM, and computes peak/RMS over every sample. Fails
    * loudly on truncated or non-PCM input — a decoder that guesses
    * feeds garbage features to training.
    */
  def decode(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 12, s"not a RIFF file: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(fourCC(buf) == "RIFF", "bad magic: not a RIFF file")
    buf.getInt // declared riff size (trust the actual buffer instead)
    require(fourCC(buf) == "WAVE", "RIFF file is not WAVE")
    var channels, sampleRate, bits = -1
    var dataOff, dataLen = -1
    var fmtSeen = false
    while (buf.remaining() >= 8 && dataOff < 0) {
      val id = fourCC(buf)
      val size = buf.getInt
      require(size >= 0 && size <= buf.remaining(),
        s"truncated WAV: chunk '$id' declares $size bytes, ${buf.remaining()} left")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small: $size")
          val fmtPos = buf.position()
          val audioFormat = buf.getShort.toInt
          require(audioFormat == 1, s"not uncompressed PCM (format $audioFormat)")
          channels = buf.getShort.toInt
          sampleRate = buf.getInt
          buf.getInt   // byte rate
          buf.getShort // block align
          bits = buf.getShort.toInt
          require(bits == 16, s"only 16-bit PCM supported, got $bits")
          fmtSeen = true
          buf.position(fmtPos + size + (size & 1)) // chunks are 2-aligned
        case "data" =>
          dataOff = buf.position()
          dataLen = size
        case _ => // unknown chunk (LIST, fact, ...): skip by size
          buf.position(buf.position() + size + (size & 1))
      }
    }
    require(fmtSeen, "no fmt chunk before data")
    require(dataOff >= 0, "no data chunk")
    require(channels >= 1 && sampleRate > 0, "corrupt fmt chunk")
    val nSamples = dataLen / 2
    val nFrames = nSamples.toLong / channels
    var peak = 0
    var sumSq = 0.0
    // zero-crossing count over channel 0 (samples are frame-major
    // interleaved): sign-change bookkeeping, O(1) state per stream —
    // zero counts as non-negative so a silent stream has 0 crossings
    var transitions = 0
    var prevNonNeg = true
    var first = true
    val pcm = ByteBuffer.wrap(bytes, dataOff, nSamples * 2)
      .order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < nSamples) {
      val v = pcm.getShort.toInt
      val a = math.abs(v)
      if (a > peak) peak = a
      sumSq += v.toDouble * v.toDouble
      if (i % channels == 0) {
        val nonNeg = v >= 0
        if (!first && nonNeg != prevNonNeg) transitions += 1
        prevNonNeg = nonNeg
        first = false
      }
      i += 1
    }
    val rms = if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples)
    Decoded(channels, sampleRate, bits, nFrames,
      nFrames * 1000L / sampleRate, peak, rms, transitions)
  }

  /** Deterministic square-wave synthesizer for the testdata path: the
    * bytes are REAL WAV (full RIFF structure, [[decode]] does a genuine
    * parse); the constant amplitude makes the decoded features
    * closed-form (rms == peak == amplitude exactly — ±A samples square
    * to A², and the mean/sqrt round-trip is exact in double for integer
    * A < 2^26), so a SQL oracle can predict what the decoder must
    * measure without itself decoding.
    */
  def squareWave(amplitude: Int, nFrames: Int, channels: Int,
      period: Int): Array[Short] = {
    require(amplitude >= 0 && amplitude <= Short.MaxValue, s"bad amplitude $amplitude")
    require(period >= 1, "period must be >= 1")
    Array.tabulate(nFrames * channels) { i =>
      val frame = i / channels
      (if ((frame / period) % 2 == 0) amplitude else -amplitude).toShort
    }
  }
}
