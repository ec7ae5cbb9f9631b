package graft

import org.apache.spark.sql.SparkSession

/** Plan audit: print the formatted physical plan of selected queries so
  * scan pruning (ReadSchema), filter pushdown (PushedFilters), broadcast
  * vs shuffle joins, and WholeStageCodegen spans can be inspected.
  *
  * Usage: runMain graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pricing_summary", "q03_clean_validate", "q06_sma",
        "q20_tpch3", "q21_tpch5", "q23_asof_join", "d03_minhash", "d05_cosine_topk")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
