package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {

  /** Materialize EVERY output column, not .count(): count(1) lets Catalyst
    * prune unreferenced projections/window expressions, under-measuring the
    * work the verify path actually does. queryExecution.toRdd evaluates the
    * optimized plan for the full output schema (each emitted UnsafeRow is
    * fully computed), with no per-type hashing caveats.
    */
  private def materialize(df: DataFrame): Unit =
    df.queryExecution.toRdd.foreach(_ => ())

  /** Per query: one untimed warmup run, then median of 3 timed runs, with
    * caches cleared between runs. Single shots on a shared box swing 2-10x
    * (GC, page cache, JIT recompiles); best-of-2 still mirrored that noise
    * across rounds, median-of-3 after a warmup is stable enough for
    * round-over-round comparison. Leaked .cache() blocks from one run must
    * not distort the next, hence the release between every run.
    *
    * A query that throws is recorded in the error map (exception class
    * name) and contributes NOTHING to the timing map or the total — a
    * failure's wall time is not a plausible benchmark number, and silently
    * timing the failure path masked real breakage for four rounds.
    * Returns (median seconds per passing query, error class per failure),
    * both in `queries` iteration order.
    */
  def run(spark: SparkSession, sfDir: String,
          queries: Seq[(String, (SparkSession, String) => DataFrame)])
      : (Seq[(String, Double)], Seq[(String, String)]) = {
    def clear(): Unit = { CacheRegistry.releaseAll(); spark.catalog.clearCache() }
    val timed = Vector.newBuilder[(String, Double)]
    val failed = Vector.newBuilder[(String, String)]
    // NonFatal only: an OOM/StackOverflow leaves the JVM corrupted — every
    // later median would be GC-thrash noise published as a plausible
    // number — so fatal errors abort the whole bench instead of being
    // recorded as one query's "error"
    import scala.util.control.NonFatal
    queries.foreach { case (name, fn) =>
      clear()
      val warmup: Option[String] =
        try { materialize(fn(spark, sfDir)); None }
        catch { case NonFatal(e) => Some(e.getClass.getName) }
      warmup match {
        case Some(errClass) => failed += name -> errClass
        case None =>
          // warmup passed; a throw here (flaky/nondeterministic failure)
          // still voids the query — partial timings are not a median
          try {
            val times = (1 to 3).map { _ =>
              clear()
              val t0 = System.nanoTime()
              materialize(fn(spark, sfDir))
              (System.nanoTime() - t0) / 1e9
            }
            timed += name -> times.sorted.apply(1)
          } catch { case NonFatal(e) => failed += name -> e.getClass.getName }
      }
    }
    (timed.result(), failed.result())
  }

  private def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)

  /** The detailed stdout/BENCH_LOCAL line: total + per-query seconds +
    * per-query error classes. `queries` stays strictly name→number so the
    * driver's parser never sees a mixed-type map; failures live in the
    * separate `errors` object.
    */
  def detailedLine(timed: Seq[(String, Double)], failed: Seq[(String, String)],
                   sfNum: String): String = {
    val qs = timed.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val errs = failed.map { case (k, c) => "\"" + k + "\":\"" + c + "\"" }
      .mkString("{", ",", "}")
    val total = timed.map(_._2).sum
    s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"errors":$errs,"sf":$sfNum}"""
  }

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
    SparkEntry.setup(spark)
    // Warm up the session (JIT, codegen, parquet footer reads) so the
    // first timed query doesn't absorb one-time JVM startup cost.
    try materialize(SparkEntry.entry(spark)) catch { case _: Throwable => () }
    val (timed, failed) = run(spark, sfDir, SparkEntry.queries.toSeq)
    val total = timed.map(_._2).sum
    // The sf dir name carries the scale factor; a silent 0 fallback would
    // mislabel every downstream comparison, so unrecognized dirs fail loudly.
    val sfNum = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1)).getOrElse(
      sys.error(s"SPARK_GRAFT_SF_DIR '$sfDir' does not contain an sf<number> component"))
    // The per-query map makes the detailed line multi-KB; the consumer tails
    // process output and a long line's START can fall outside the tail
    // window, making it unparseable. So: detailed line first (and persisted
    // to BENCH_LOCAL.json, since stdout interleaves with launcher logs),
    // then a SHORT total-only line as the LAST stdout output — that one is
    // what the driver must always be able to parse.
    val detailed = detailedLine(timed, failed, sfNum)
    // the short line is the ONLY line the driver reliably parses; a
    // failing query shrinks the total (it contributes no timing), which
    // without a failure marker would read as a performance IMPROVEMENT —
    // so the error count rides along
    val short =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","errors":${failed.size},"sf":$sfNum}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_LOCAL.json"),
      (detailed + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println(detailed)
    println(short)
    spark.stop()
  }
}
