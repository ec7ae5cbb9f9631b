package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Executor-side media decode pipelines over the [[Wav]] and [[Bmp]]
  * codecs — the REAL counterpart of [[BinaryColumns.fakeDecode]]'s
  * documented stub: payload bytes are synthesized deterministically per
  * document (the testdata carries no media), but everything after the
  * bytes exist is the genuine article — RIFF chunk walking / BMP header
  * parsing, PCM demux / padded BGR row access, and feature extraction —
  * and because the synth parameters are closed-form, a SQL oracle
  * PREDICTS every decoded feature without touching a byte: hash
  * equality proves encoder → decoder → features compose exactly.
  *
  * Scale shape: `mapPartitions` over (doc_id, params) — decode is
  * embarrassingly parallel, per-row cost ∝ payload size, no shuffle at
  * all until a downstream aggregate. A real deployment swaps the
  * synthesizer for a parquet binary column scan and the pure-JVM codecs
  * for JNI/ffmpeg behind the same partition-batch interface.
  */
object MediaFeatures {

  private val wavSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("peak", IntegerType, nullable = false),
    StructField("rms", DoubleType, nullable = false)))

  /** Synthesize a square-wave WAV per document (amplitude, length, and
    * channel count derived from doc_id / n_chars), then REAL-decode it
    * and emit the audio features a curation pipeline keys on.
    */
  def wavFeatures(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    val rdd = documents.select(col("doc_id"), col("n_chars"))
      .rdd.mapPartitions(_.map { r =>
        val d = r.getLong(0)
        val amplitude = (1000L + (d * 37L) % 20000L).toInt
        val frames = (200L + r.getLong(1) % 800L).toInt
        val channels = (1L + d % 2L).toInt
        val bytes = Wav.encode(
          Wav.squareWave(amplitude, frames, channels, period = 8 + (d % 25).toInt),
          channels, sampleRate = 8000)
        val dec = Wav.decode(bytes)
        Row(d, bytes.length, dec.channels, dec.sampleRate, dec.bits,
          dec.nFrames, dec.durationMs, dec.peak, dec.rms)
      })
    spark.createDataFrame(rdd, wavSchema)
  }

  private val bmpSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false),
    StructField("dhash", LongType, nullable = false)))

  /** Synthesize a linear-congruential test image per document, then
    * REAL-decode the BMP and emit channel means plus the 56-bit
    * perceptual difference hash — the image near-dup key that makes
    * image dedup the same equi-join shape as text MinHash (d03).
    */
  def imageFeatures(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    val rdd = documents.select(col("doc_id"))
      .rdd.mapPartitions(_.map { r =>
        val d = r.getLong(0)
        val w = 24 + (d % 41).toInt
        val h = 16 + (d % 29).toInt
        val bytes = Bmp.encode(w, h, Bmp.pattern(d))
        val dec = Bmp.decode(bytes)
        Row(d, bytes.length, dec.width, dec.height,
          dec.meanR, dec.meanG, dec.meanB, dec.dhash)
      })
    spark.createDataFrame(rdd, bmpSchema)
  }
}
