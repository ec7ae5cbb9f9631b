package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events schema: watermarked
  * tumbling / sliding event-time window aggregations.
  *
  * Re-expresses the reference's scheduled hourly batch rollups
  * (`/root/reference/dags/financial_data_pipeline.py` — Airflow cron
  * windows) as continuous Structured Streaming: the same aggregate is
  * declared once and runs identically over a bounded DataFrame (batch
  * parity with `q22_window_tumble`) or an unbounded stream with a
  * watermark bounding state.
  *
  * Scale: windowed aggregation state is partitioned by (window, type) —
  * watermark eviction keeps state bounded to (lateness / slide) windows
  * per key, so a 100 TB/day stream holds state proportional to key
  * cardinality, not history.
  */
object EventStream {

  /** The events stream schema (matches the testdata events table, with a
    * micros timestamp).
    */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based stream source over a directory of parquet events. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Tumbling window counts/sums per event_type — identical output shape
    * to the batch `q22_window_tumble` query so the memory-sink spec can
    * assert parity. Works on both streaming and batch inputs.
    */
  def tumbling(events: DataFrame, width: String = "1 hour",
               watermark: String = "2 hours"): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_v"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_type"), col("n"), col("sum_v"))
  }

  /** Sliding window per-user mean value (width/slide), watermarked. */
  def sliding(events: DataFrame, width: String = "1 hour",
              slide: String = "30 minutes", watermark: String = "2 hours"): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupBy(window(col("ts"), width, slide), col("user_id"))
      .agg(
        count(lit(1)).as("n"),
        (sum(col("value").cast("decimal(18,4)")).cast("double") / count(lit(1))).as("v_avg"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("user_id"), col("n"), col("v_avg"))
  }
}
