package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Materialize EVERY output column, not .count(): count(1) lets Catalyst
    // prune unreferenced projections/window expressions, under-measuring the
    // work the verify path actually does. queryExecution.toRdd evaluates the
    // optimized plan for the full output schema (each emitted UnsafeRow is
    // fully computed), with no per-type hashing caveats.
    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreach(_ => ())
    // Warm up the session (JIT, codegen, parquet footer reads) so the
    // first timed query doesn't absorb one-time JVM startup cost.
    try materialize(SparkEntry.entry(spark)) catch { case _: Throwable => () }
    // Best-of-2 per query with the cache cleared between queries: single
    // shots on a shared box are noisy (GC, page cache, JIT), and leaked
    // .cache() blocks from one query must not distort the next.
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        CacheRegistry.releaseAll()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { materialize(fn(spark, sfDir)) } catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    // One machine-readable line. Keep it SHORT (3dp per query) and flat:
    // the consumer tails process output, so a multi-KB line risks the line
    // start falling outside the tail window. Also persisted to
    // BENCH_LOCAL.json since stdout can interleave with launcher logs.
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val sfNum = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1)).getOrElse("0")
    val line =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":$sfNum}"""
    println(line)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_LOCAL.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
