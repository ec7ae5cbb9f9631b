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
  /** Scan-split memo per (dir, table): total parquet row-group count
    * across the table's files — the number of non-empty tasks a Spark
    * scan of it can produce. Read once per session from the footers
    * (KBs of metadata, no data pages); pure metadata like the schema
    * memo above.
    */
  private val splitMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Integer]

  private def scanSplits(spark: SparkSession, dir: String, name: String): Int =
    splitMemo.computeIfAbsent((dir, name), { _ =>
      val conf = spark.sessionState.newHadoopConf()
      val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
      val fsys = p.getFileSystem(conf)
      val files =
        if (fsys.getFileStatus(p).isDirectory)
          fsys.listStatus(p).toSeq
            .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        else Seq(fsys.getFileStatus(p))
      files.map { st =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRowGroups.size finally r.close()
      }.sum
    })

  /** Scale-adaptive scan fan-out (guide §2.4/§6). The testdata ships each
    * table as ONE single-row-group parquet file — ONE scan task no matter
    * the split config — so every downstream per-row pipeline (decimal
    * aggregation, shingle explosion, md5, 64-dim cosines) that runs
    * before the first exchange is single-threaded. Repartition to session
    * parallelism ONLY when the physical layout under-parallelizes the
    * scan (row-group splits < cores); at production scale the source is
    * many files/row groups, the condition is false, and NO shuffle is
    * added — the very shuffle that would be ruinous on a 100 TB fact
    * table. Hash-by-key rather than round-robin: deterministic under
    * task retry, skips round-robin's local sort-before-repartition
    * (SPARK-23207), and the key is chosen to match the table's dominant
    * downstream clustering (events by user_id, lineitem by l_orderkey)
    * so per-key windows/aggregates/joins REUSE the exchange instead of
    * re-shuffling.
    */
  def fanned(spark: SparkSession, dir: String, name: String, df: DataFrame,
             keys: Seq[String]): DataFrame = {
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    if (scanSplits(spark, dir, name) < n) df.repartition(n, keys.map(col): _*)
    else df
  }

  def documents(spark: SparkSession, dir: String): DataFrame = {
    val d = load(spark, dir, "documents")
    fanned(spark, dir, "documents", d, Seq("doc_id"))
  }
  def embeddings(spark: SparkSession, dir: String): DataFrame = {
    val e = load(spark, dir, "embeddings")
    fanned(spark, dir, "embeddings", e, Seq("vec_id"))
  }
}
