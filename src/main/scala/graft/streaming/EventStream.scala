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

  /** Stream-stream interval join: each purchase joined to the same
    * user's clicks in the `within` interval before it. Both sides are
    * watermarked, and the time-range predicate bounds the join state —
    * Spark evicts buffered rows once the watermark passes the range, so
    * state is O(rate × within), not O(history). Works identically on
    * bounded frames (batch parity testable).
    */
  def purchaseClickJoin(events: DataFrame, within: String = "1 hour",
                        watermark: String = "2 hours",
                        joinType: String = "inner"): DataFrame = {
    def wm(df: DataFrame, tsCol: String): DataFrame =
      if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    val purchases = wm(events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts")), "p_ts")
    val clicks = wm(events.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts")), "c_ts")
    // joinType "left_outer": unmatched purchases emit (null click) — in
    // streaming mode only once the watermark passes the purchase's join
    // range (the engine must be sure no matching click can still arrive),
    // so the stream tail is withheld by contract; matched pairs emit
    // immediately either way. Batch input degrades to a plain left join.
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $within"),
      joinType)
      .select(col("p_id"), col("user_id"), col("c_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
  }

  /** Streaming exact dedup on event_id — the at-least-once-ingestion
    * guard (re-deliveries of the same event are dropped). Uses
    * `dropDuplicatesWithinWatermark`, so dedup state is evicted once the
    * watermark passes a key: state is O(rate × delay), not O(history) —
    * the only formulation that survives an unbounded 100 TB/day stream.
    * Duplicate deliveries arriving later than the watermark horizon are
    * by contract not caught (that is the deliberate state/completeness
    * trade every streaming dedup makes). Batch input degrades to plain
    * dropDuplicates (re-expresses data_cleaning.py dropDuplicates).
    */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

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
