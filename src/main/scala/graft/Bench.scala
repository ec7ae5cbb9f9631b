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
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { materialize(fn(spark, sfDir)) } catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
