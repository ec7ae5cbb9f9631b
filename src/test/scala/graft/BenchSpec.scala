package graft

/** The bench harness must never let a failing query contribute a silent,
  * plausible-looking number: failures land in the error map (and the
  * detailed line's `errors` object), passing queries in the timing map.
  * Timing is pass-major (3 interleaved passes over the whole list) so a
  * shared-box contention burst contaminates at most one sample per query;
  * median and min are both reported.
  */
class BenchSpec extends SparkSpec {

  test("a broken query is reported as err, not timed into the total") {
    val qs: Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame)] = Seq(
      "ok_query" -> ((s, dir) => s.read.parquet(s"$dir/region.parquet")),
      "broken_query" -> ((s, dir) =>
        s.read.parquet(s"$dir/does_not_exist.parquet")))
    val (timed, failed) = Bench.run(spark, sfDir, qs)
    assert(timed.map(_._1) == Seq("ok_query"))
    val (med, min) = timed.head._2
    assert(med >= 0.0 && min >= 0.0 && min <= med) // min can't exceed median
    assert(failed.map(_._1) == Seq("broken_query"))
    assert(failed.head._2.nonEmpty) // the exception class name

    val line = Bench.detailedLine(timed, failed, "0.001")
    assert(line.contains("\"errors\":{\"broken_query\":\""))
    assert(!line.contains("\"broken_query\":0")) // no fabricated timing
    // queries object holds only the passing query; min map rides along
    assert(line.contains("\"ok_query\":"))
    assert(line.contains("\"queries_min\":{\"ok_query\":"))
    assert(line.contains("\"total_min\":"))
  }

  test("all-passing run has an empty errors object") {
    val qs: Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame)] = Seq(
      "ok_query" -> ((s, dir) => s.read.parquet(s"$dir/region.parquet")))
    val (timed, failed) = Bench.run(spark, sfDir, qs)
    assert(failed.isEmpty)
    assert(Bench.detailedLine(timed, failed, "0.001").contains("\"errors\":{}"))
  }

  test("a query that fails only in a timed pass is voided, not half-timed") {
    // Fails on its 3rd materialization (warmup + pass1 succeed, pass2
    // throws): the query must land in `failed` with no timing entry —
    // a 2-sample median would be published as if it were 3.
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val qs: Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame)] = Seq(
      "flaky" -> ((s, dir) => {
        if (calls.incrementAndGet() == 3) sys.error("flaky boom")
        s.read.parquet(s"$dir/region.parquet")
      }))
    val (timed, failed) = Bench.run(spark, sfDir, qs)
    assert(timed.isEmpty)
    assert(failed.map(_._1) == Seq("flaky"))
  }
}
