package graft

/** The bench harness must never let a failing query contribute a silent,
  * plausible-looking number: failures land in the error map (and the
  * detailed line's `errors` object), passing queries in the timing map.
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
    assert(timed.head._2 >= 0.0)
    assert(failed.map(_._1) == Seq("broken_query"))
    assert(failed.head._2.nonEmpty) // the exception class name

    val line = Bench.detailedLine(timed, failed, "0.001")
    assert(line.contains("\"errors\":{\"broken_query\":\""))
    assert(!line.contains("\"broken_query\":0")) // no fabricated timing
    // queries object holds only the passing query
    assert(line.contains("\"ok_query\":"))
  }

  test("all-passing run has an empty errors object") {
    val qs: Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame)] = Seq(
      "ok_query" -> ((s, dir) => s.read.parquet(s"$dir/region.parquet")))
    val (timed, failed) = Bench.run(spark, sfDir, qs)
    assert(failed.isEmpty)
    assert(Bench.detailedLine(timed, failed, "0.001").contains("\"errors\":{}"))
  }
}
