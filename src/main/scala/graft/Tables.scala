package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** Typed loaders for the driver-generated testdata tables.
  *
  * Each table is a single parquet file under `dir`. Loading goes through
  * `spark.read.parquet` so Catalyst handles column pruning and filter
  * pushdown — callers should select only the columns they need so the
  * pruned schema reaches the scan (`ReadSchema` in explain).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Schema memo per (dir, table): without an explicit schema every
    * `spark.read.parquet` call runs a footer-reading schema-inference
    * JOB before the real work (50–150 ms of fixed latency per read —
    * one or more per query, hundreds across a bench sweep). The memo
    * plays the role a catalog (Hive metastore / table format manifest)
    * plays at production scale: infer once per session, declare
    * thereafter. Pure METADATA — row data is never cached here, every
    * query still computes from the parquet files.
    */
  private val schemaMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
      org.apache.spark.sql.types.StructType]

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val schema = schemaMemo.computeIfAbsent((dir, name),
      _ => spark.read.parquet(s"$dir/$name.parquet").schema)
    spark.read.schema(schema).parquet(s"$dir/$name.parquet")
  }

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** The events table's `ts` physical type has varied across testdata
    * generations — TIMESTAMP(NANOS) (read as raw long nanos via the
    * legacy conf, Spark's vectorized reader rejects nanos), TIMESTAMP
    * (µs, surfaced as TIMESTAMP_NTZ under parquet NTZ inference), or a
    * session-zoned timestamp. Normalize all of them to a session TIMESTAMP
    * holding the same microsecond instant: the session zone is UTC
    * everywhere in graft, so each branch is lossless and bit-identical to
    * DuckDB's `epoch_us(ts)` on the same file.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // nanos-as-long generation
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType => // µs wall-clock
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  /** documents/embeddings ship as one small parquet file = ONE scan
    * partition, so every downstream per-row computation (shingle
    * explosion, md5, 64-dim cosines) would run in a single task.
    * Repartition to the session's shuffle parallelism right after the
    * scan: one trivial shuffle of a small table buys full-core fan-out
    * for the hash/vector pipelines. (At production scale the source is
    * many files and this repartition is unnecessary — but harmless, as
    * it coalesces into the first required exchange.)
    */
  def documents(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt)
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "embeddings")
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt)
}
