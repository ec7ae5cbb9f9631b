package graft.sources

import graft.SparkSpec

/** The named-table catalog surface must give pure-SQL users the same
  * answers — and the same scan-level pushdown — as the DataFrame API.
  */
class CatalogSpec extends SparkSpec {

  test("name-based SQL over registered views matches the DataFrame API result") {
    // q67 registers the views and runs the exact q20 oracle text via
    // spark.sql; both results carry ORDER BY + LIMIT, so row order is
    // deterministic and comparable directly
    val viaApi = graft.queries.Core.defs("q20_tpch3")(spark, sfDir).collect().toSeq
    val viaSql = graft.SparkEntry.queries("q67_catalog_sql")(spark, sfDir).collect().toSeq
    assert(viaSql == viaApi)
    assert(viaSql.nonEmpty)
  }

  test("views cover every table, including the nanos-timestamp events table") {
    Catalog.registerViews(spark, sfDir)
    graft.Tables.names.foreach { n =>
      val c = spark.sql(s"SELECT count(*) AS n FROM $n").collect()(0).getLong(0)
      assert(c > 0, s"view $n is empty")
    }
    // the view bakes in the loader's nanos→micros conversion
    val day = spark.sql("SELECT CAST(min(ts) AS DATE) AS d FROM events").collect()(0)
    assert(day.getDate(0) != null)
  }

  test("external tables over parquet locations are queryable by name with scan pushdown") {
    Catalog.registerExternalTables(spark, sfDir, "graft_cat_spec")
    try {
      val n = spark.sql("SELECT count(*) AS n FROM graft_cat_spec.lineitem")
        .collect()(0).getLong(0)
      assert(n == graft.Tables.lineitem(spark, sfDir).count())
      // a filter written in SQL against the catalog name must still reach
      // the parquet scan
      val plan = spark.sql(
        "SELECT l_orderkey FROM graft_cat_spec.lineitem WHERE l_quantity > 49")
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity"), plan)
      assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), plan)
    } finally spark.sql("DROP DATABASE IF EXISTS graft_cat_spec CASCADE")
  }

  test("registering external tables is idempotent and never touches data files") {
    Catalog.registerExternalTables(spark, sfDir, "graft_cat_spec2")
    try {
      Catalog.registerExternalTables(spark, sfDir, "graft_cat_spec2") // no throw
      intercept[IllegalArgumentException] {
        Catalog.registerExternalTables(spark, sfDir, "bad-name; drop")
      }
    } finally spark.sql("DROP DATABASE IF EXISTS graft_cat_spec2 CASCADE")
  }
}
