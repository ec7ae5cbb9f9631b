package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque binary payloads + typed metadata.
  *
  * Mirrors how a training-data pipeline carries images/audio/video through
  * Spark: the payload is an opaque `binary` column, metadata travels in a
  * typed struct, and decode/feature-extraction runs batch-wise inside the
  * executors (`mapPartitions`), never on the driver.
  *
  * The container ships no image/audio codecs, so [[fakeDecode]] is a
  * clearly-marked deterministic STUB standing in for a real decoder (e.g.
  * libjpeg/ffmpeg via Pandas UDF in PySpark or a JNI decoder in Scala).
  * Everything around it — binary schema, partition-parallel batch shape,
  * output struct — is the real plumbing and is what the tests exercise.
  */
object BinaryColumns {

  /** Output schema of the decode stage: one row per asset with typed
    * metadata and a fixed-length feature vector.
    */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("feature", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** STUB decoder: a real pipeline would decode the payload here (JPEG
    * header parse, PCM frames, ...). This deterministic fake derives
    * "dimensions" and an 8-dim "feature vector" from the raw bytes so the
    * surrounding plumbing is testable without codec libraries.
    */
  private[multimodal] def fakeDecode(docId: Long, payload: Array[Byte]): Row = {
    val n = payload.length
    def b(i: Int): Int = if (n == 0) 0 else payload(i % n) & 0xff
    val width = 16 + (b(0) * 256 + b(1)) % 2048
    val height = 16 + (b(2) * 256 + b(3)) % 2048
    val frames = 1 + b(4) % 32
    val feature = Array.tabulate(8) { j =>
      var acc = 0L
      var i = j
      while (i < n) { acc += (payload(i) & 0xff).toLong; i += 8 }
      acc.toDouble / math.max(n, 1).toDouble
    }
    Row(docId, n, "application/octet-stream", width, height, frames, feature.toSeq)
  }

  /** Binary-asset frame: payload bytes + metadata struct, built from the
    * documents table (text bytes stand in for media bytes). At 100 TB the
    * payload column stays columnar parquet binary; metadata is a pruned
    * struct so scans that only need metadata never read the payload.
    */
  def assets(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        col("source").as("origin"),
        col("lang").as("tag"),
        col("n_chars").cast("long").as("declared_size")).as("meta"))

  /** Executor-side "decode" over binary payloads: mapPartitions so a real
    * decoder could amortize per-batch init (codec contexts, model weights)
    * exactly like `mapInPandas` batches in PySpark.
    */
  def decode(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val rdd = assets.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.map(r => fakeDecode(r.getLong(0), r.getAs[Array[Byte]](1)))
    }
    spark.createDataFrame(rdd, decodedSchema)
  }

  /** Aspect-preserving resize metadata: scale (width, height) to fit in a
    * `maxDim` box (integer floor arithmetic — deterministic). A real
    * pipeline would pass these targets to the decoder; here they are the
    * column-level plumbing.
    */
  def resizedDims(width: org.apache.spark.sql.Column, height: org.apache.spark.sql.Column,
                  maxDim: Int): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val longest = greatest(width, height)
    // degenerate inputs (longest <= 0) pass through unchanged — never a
    // divide-by-zero; scaled dims floor to at least 1px so an extreme
    // aspect ratio can't emit a zero-sized target
    val scaled = (c: org.apache.spark.sql.Column) =>
      when(longest <= maxDim, c)
        .otherwise(greatest(floor(c * maxDim / longest).cast("int"), lit(1)))
    (scaled(width), scaled(height))
  }

  /** Frame sampling plumbing: one row per sampled frame (every `step`-th
    * frame of each asset), with a deterministic per-frame fingerprint
    * standing in for a decoded-frame feature. The explode keeps frames
    * distributed — no per-asset collection.
    */
  def sampleFrames(decoded: DataFrame, step: Int): DataFrame =
    decoded
      // zero-frame assets (corrupt/empty media) emit no frame rows rather
      // than crashing sequence() with illegal boundaries
      .filter(col("n_frames") > 0)
      .select(
        col("doc_id"), col("n_frames"), col("width"), col("height"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step))).as("frame_idx"))
      .withColumn("frame_fp",
        md5(concat_ws(":", col("doc_id"), col("frame_idx")).cast("binary")))

  /** Compressed-image assets: the payload column carries an ACTUAL PNG
    * (zlib-deflated, CRC-validated — [[Png]] scaladoc) synthesized from
    * the deterministic [[Bmp.pattern]], so the binary-column story is
    * real end to end: opaque compressed bytes in, executor-side decode
    * out, and every decoded feature SQL-replicable from the pattern.
    */
  def pngAssets(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    val rdd = documents.select(col("doc_id")).rdd.mapPartitions(_.map { r =>
      val d = r.getLong(0)
      val w = 24 + (d % 37).toInt
      val h = 16 + (d % 31).toInt
      Row(d, Png.encode(w, h, Bmp.pattern(d)))
    })
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false))))
  }

  /** Executor-side REAL decode of the PNG payload column: chunk walk,
    * CRC validation, inflate, unfilter, features — per batch inside
    * mapPartitions, the same shape a JNI/Pandas decoder would run in.
    */
  def decodePng(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val rdd = assets.select("doc_id", "payload").rdd.mapPartitions(_.map { r =>
      val dec = Png.decode(r.getAs[Array[Byte]](1))
      Row(r.getLong(0), "image/png", dec.width, dec.height,
        dec.meanR, dec.meanG, dec.meanB, dec.dhash)
    })
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("mime", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_r", DoubleType, nullable = false),
      StructField("mean_g", DoubleType, nullable = false),
      StructField("mean_b", DoubleType, nullable = false),
      StructField("dhash", LongType, nullable = false))))
  }

  /** m01 query surface: typed metadata + features REALLY decoded from a
    * compressed (PNG) binary payload column — under the oracle gate,
    * since the pattern math makes every feature SQL-replicable. The
    * payload byte count is deliberately NOT emitted: deflate output
    * size is implementation-defined, the one thing an oracle cannot
    * predict.
    */
  def extractMeta(documents: DataFrame): DataFrame = {
    val a = pngAssets(documents)
    decodePng(a)
      .join(documents.select(col("doc_id"), col("source").as("origin"),
        col("lang").as("tag"), col("n_chars").cast("long").as("declared_size")),
        Seq("doc_id"))
      .select(
        col("doc_id"), col("mime"), col("width"), col("height"),
        round(col("mean_r") + lit(1e-7), 4).as("mean_r"),
        round(col("mean_g") + lit(1e-7), 4).as("mean_g"),
        round(col("mean_b") + lit(1e-7), 4).as("mean_b"),
        col("dhash"), col("origin"), col("tag"), col("declared_size"))
  }
}
