package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.FileSourceScanExec

/** Pushdown audit: the "filters and projections reach the scan" claim,
  * asserted permanently rather than by one-off inspection. A parquet
  * scan that reads every column for a narrow projection, or evaluates a
  * selective predicate only above the scan, is exactly the regression
  * that silently turns a 100 TB scan into a full-table read.
  */
class PushdownAuditSpec extends SparkSpec {

  private def scans(name: String): Seq[FileSourceScanExec] =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }

  test("selective predicates are pushed to the parquet scan") {
    // q20 filters lineitem on l_shipdate and orders on o_orderdate;
    // both must appear as pushed data filters, not just post-scan Filters.
    val pushed = scans("q20_tpch3").flatMap(_.dataFilters).map(_.sql).mkString(" | ")
    assert(pushed.contains("l_shipdate"), s"l_shipdate not pushed: $pushed")
    assert(pushed.contains("o_orderdate"), s"o_orderdate not pushed: $pushed")
  }

  test("q77's scan-heavy predicates reach the parquet scan") {
    // Q6 is a pure scan query: if its date/quantity filters evaluate
    // only above the scan, the whole query is a full-table read.
    val pushed = scans("q77_tpch6").flatMap(_.dataFilters).map(_.sql).mkString(" | ")
    assert(pushed.contains("l_shipdate"), s"l_shipdate not pushed: $pushed")
    assert(pushed.contains("l_quantity"), s"l_quantity not pushed: $pushed")
  }

  test("column pruning reaches the scan (narrow projections read narrow schemas)") {
    // q01 touches 6 of lineitem's 11 columns; the scan must not read more.
    val q01 = scans("q01_pricing_summary")
    assert(q01.nonEmpty)
    assert(q01.forall(_.requiredSchema.size <= 6),
      s"q01 scan schemas: ${q01.map(_.requiredSchema.fieldNames.mkString(","))}")
    // q34 needs exactly one column from each side.
    assert(scans("q34_cust_order_dist").forall(_.requiredSchema.size == 1))
  }

  test("partition-split scans stay parallel (no single-split table reads)") {
    // documents/embeddings ship as single parquet files; Tables must
    // repartition or split them so a 32-core local run (and a 1000-core
    // cluster) isn't serialized on one input split.
    val docs = graft.Tables.documents(spark, sfDir)
    assert(docs.rdd.getNumPartitions > 1,
      s"documents read as ${docs.rdd.getNumPartitions} partition(s)")
  }

  test("Ingest.writePartitioned output prunes directories on partition filters") {
    import org.apache.spark.sql.functions.col
    // the reference's standard lake layout: year/month directory
    // partitioning. A time-range read over it must prune at the
    // DIRECTORY level (PartitionFilters in the scan) — if year/month
    // arrive only as data filters, every partition's files are still
    // listed and opened, which at 100 TB is the difference between
    // reading a month and reading a decade.
    val out = java.nio.file.Files.createTempDirectory("graft-prune").toString
    graft.sources.Ingest.writeByMonth(
      graft.Tables.orders(spark, sfDir), "o_orderdate", out)
    val read = spark.read.parquet(out)
      .filter(col("year") === 1995 && col("month") === 3)
    val scan = read.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scan.nonEmpty)
    val pf = scan.flatMap(_.partitionFilters).map(_.sql).mkString(" | ")
    assert(pf.contains("year") && pf.contains("month"),
      s"year/month are not partition filters: '$pf'")
    // the pruned scan must list only the one matching directory
    val selected = scan.map(_.relation.location.listFiles(
      scan.head.partitionFilters, scan.head.dataFilters).size).sum
    assert(selected == 1, s"expected 1 matching partition dir, got $selected")
  }

  test("TxLog reads keep pushdown and pruning through the manifest-listed scan") {
    import spark.implicits._
    // file-level skipping (manifest stats) stacks ON TOP of parquet
    // row-group pushdown, it must not replace it: the exact range
    // filter readBetween adds has to reach the scan as a data filter,
    // and a narrow projection has to narrow the read schema — the
    // transactional layer must not cost the 100 TB reader either lever.
    val t = java.nio.file.Files.createTempDirectory("graft-tx-pushdown")
      .resolve("t").toString
    graft.sources.TxLog.overwrite(
      (0 until 100).map(i => (i.toLong, s"v$i")).toDF("k", "v"), t)
    val ranged = graft.sources.TxLog.readBetween(spark, t, "k", Some(10L), Some(20L))
    val rs = ranged.queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }
    assert(rs.nonEmpty)
    val pushed = rs.flatMap(_.dataFilters).map(_.sql).mkString(" | ")
    assert(pushed.contains("k"), s"readBetween's filter not pushed: '$pushed'")
    val narrow = graft.sources.TxLog.read(spark, t).select("v")
    val ns = narrow.queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }
    assert(ns.nonEmpty && ns.forall(_.requiredSchema.fieldNames.toSeq == Seq("v")),
      s"schemas: ${ns.map(_.requiredSchema.fieldNames.mkString(","))}")
  }
}
