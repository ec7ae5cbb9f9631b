package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partitioned graft-txlog tables: Hive-style layout with partition
  * columns kept INSIDE the data files, per-file partition values in the
  * manifest, dynamic partition overwrite, metadata-only partition drop,
  * and exact manifest-time partition pruning.
  */
class TxPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-txpart").resolve("t").toString

  private def sample = Seq(
    (1L, "2024", "a", 10.0), (2L, "2024", "b", 20.0),
    (3L, "2025", "a", 30.0), (4L, "2025", "b", 40.0),
    (5L, "2026", "a", 50.0)
  ).toDF("id", "yr", "grp", "v")

  test("partitioned overwrite: files land per partition, parts metadata complete") {
    val t = tmpTable()
    TxLog.overwrite(sample, t, partitionBy = Some(Seq("yr")))
    val m = TxLog.manifest(spark, t)
    assert(m.partitionBy.contains(Seq("yr")))
    val entries = m.stats.get
    assert(entries.size == m.files.size)
    assert(entries.forall(_.parts.isDefined))
    assert(entries.flatMap(_.parts.get.get("yr")).toSet == Set("2024", "2025", "2026"))
    // every file path routes through its partition directory
    assert(m.files.forall(_.contains("__gp_yr=")))
    // read is one flat scan: full content back, partition col a data col
    assert(TxLog.read(spark, t).as[(Long, String, String, Double)]
      .collect().toSet == sample.as[(Long, String, String, Double)].collect().toSet)
  }

  test("append inherits the table's partition layout") {
    val t = tmpTable()
    TxLog.overwrite(sample, t, partitionBy = Some(Seq("yr")))
    TxLog.append(Seq((6L, "2026", "b", 60.0)).toDF("id", "yr", "grp", "v"), t)
    val m = TxLog.manifest(spark, t)
    assert(m.partitionBy.contains(Seq("yr")))
    assert(m.stats.get.forall(_.parts.isDefined))
    assert(TxLog.read(spark, t).count() == 6)
  }

  test("partitions() lists each live partition with file and row counts, metadata-only") {
    val t = tmpTable()
    TxLog.overwrite(sample, t, partitionBy = Some(Seq("yr")))
    val p = TxLog.partitions(spark, t).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    assert(p == Map("2024" -> 2L, "2025" -> 2L, "2026" -> 1L))
  }

  test("overwritePartitions replaces exactly the incoming partitions") {
    val t = tmpTable()
    TxLog.overwrite(sample, t, partitionBy = Some(Seq("yr")))
    val before = TxLog.manifest(spark, t)
    val untouched = before.files.filterNot(_.contains("__gp_yr=2024")).toSet
    TxLog.overwritePartitions(
      Seq((9L, "2024", "z", 99.0)).toDF("id", "yr", "grp", "v"), t)
    val after = TxLog.manifest(spark, t)
    // 2025/2026 files are the SAME paths (never rewritten, never read)
    assert(untouched.subsetOf(after.files.toSet))
    assert(!after.files.exists(f => before.files.contains(f) && f.contains("__gp_yr=2024")))
    val got = TxLog.read(spark, t).as[(Long, String, String, Double)].collect().toSet
    assert(got == Set((9L, "2024", "z", 99.0), (3L, "2025", "a", 30.0),
      (4L, "2025", "b", 40.0), (5L, "2026", "a", 50.0)))
  }

  test("dropPartitions is metadata-only and exact") {
    val t = tmpTable()
    TxLog.overwrite(sample, t, partitionBy = Some(Seq("yr")))
    val before = TxLog.manifest(spark, t)
    val v = TxLog.dropPartitions(spark, t, Map("yr" -> "2024"))
    val after = TxLog.manifest(spark, t)
    assert(after.version == v)
    // no new data files were written — the commit only DE-references
    assert(after.files.toSet.subsetOf(before.files.toSet))
    assert(after.files.forall(!_.contains("__gp_yr=2024")))
    assert(TxLog.read(spark, t).select("yr").distinct().as[String]
      .collect().toSet == Set("2025", "2026"))
    // nothing matched: version unchanged
    assert(TxLog.dropPartitions(spark, t, Map("yr" -> "1999")) == v)
    // numeric-domain match: int-typed partition values compare numerically
    val t2 = tmpTable()
    TxLog.overwrite(Seq((1L, 7), (2L, 8)).toDF("id", "k"), t2,
      partitionBy = Some(Seq("k")))
    TxLog.dropPartitions(spark, t2, Map("k" -> 7))
    assert(TxLog.read(spark, t2).select("k").as[Int].collect().toSeq == Seq(8))
  }

  test("readPartition plans only the matching files") {
    val t = tmpTable()
    TxLog.overwrite(sample, t, partitionBy = Some(Seq("yr", "grp")))
    val one = TxLog.readPartition(spark, t, Map("yr" -> "2025", "grp" -> "a"))
    assert(one.inputFiles.length == 1)
    assert(one.as[(Long, String, String, Double)].collect().toSeq ==
      Seq((3L, "2025", "a", 30.0)))
    // subset of partition columns selects the whole slice
    val slice = TxLog.readPartition(spark, t, Map("yr" -> "2025"))
    assert(slice.inputFiles.length == 2)
    assert(slice.count() == 2)
  }

  test("readWhere prunes on a partition column via its min=max stats") {
    val t = tmpTable()
    TxLog.overwrite(sample, t, partitionBy = Some(Seq("yr")))
    val pruned = TxLog.readBetween(spark, t, "yr", Some("2025"), Some("2025"))
    assert(pruned.inputFiles.length == 2)
    assert(pruned.count() == 2)
  }

  test("NULL partition values round-trip through the hive sentinel") {
    val t = tmpTable()
    val df = Seq((1L, Some("x")), (2L, None), (3L, Some("y")))
      .toDF("id", "k")
    TxLog.overwrite(df, t, partitionBy = Some(Seq("k")))
    val m = TxLog.manifest(spark, t)
    assert(m.stats.get.flatMap(_.parts.get.get("k")).toSet ==
      Set("x", "y", TxLog.nullPartition))
    // partitions() renders the sentinel as SQL NULL
    val shown = TxLog.partitions(spark, t).collect().map(_.isNullAt(0))
    assert(shown.count(identity) == 1)
    // null selects the NULL partition; read round-trips the null rows
    assert(TxLog.readPartition(spark, t, Map("k" -> null))
      .select("id").as[Long].collect().toSeq == Seq(2L))
    TxLog.dropPartitions(spark, t, Map("k" -> null))
    assert(TxLog.read(spark, t).filter(col("k").isNull).count() == 0)
    assert(TxLog.read(spark, t).count() == 2)
  }

  test("delete and update rewrites keep partition metadata exact") {
    val t = tmpTable()
    TxLog.overwrite(sample, t, partitionBy = Some(Seq("yr")))
    // boundary delete inside 2024 rewrites that file under its partition dir
    TxLog.delete(spark, t, col("id") === 1L)
    val m1 = TxLog.manifest(spark, t)
    assert(m1.stats.get.forall(_.parts.isDefined))
    // dynamic overwrite still targets exactly (proves parts stayed complete)
    TxLog.overwritePartitions(
      Seq((8L, "2024", "w", 80.0)).toDF("id", "yr", "grp", "v"), t)
    assert(TxLog.read(spark, t).filter(col("yr") === "2024")
      .select("id").as[Long].collect().toSeq == Seq(8L))
    TxLog.update(spark, t, col("id") === 8L, Seq("v" -> lit(88.0)))
    val m2 = TxLog.manifest(spark, t)
    assert(m2.stats.get.forall(_.parts.isDefined))
    assert(TxLog.readPartition(spark, t, Map("yr" -> "2024"))
      .select("v").as[Double].collect().toSeq == Seq(88.0))
  }

  test("compact on a partitioned table preserves rows and parts") {
    val t = tmpTable()
    TxLog.overwrite(sample.repartition(3), t, partitionBy = Some(Seq("yr")))
    (1 to 3).foreach(i =>
      TxLog.append(Seq((100L + i, "2024", "c", i.toDouble))
        .toDF("id", "yr", "grp", "v"), t))
    val before = TxLog.read(spark, t).as[(Long, String, String, Double)].collect().toSet
    TxLog.compact(spark, t, smallFileBytes = 10L << 20)
    val m = TxLog.manifest(spark, t)
    assert(m.action == "compact")
    assert(m.stats.get.forall(_.parts.isDefined))
    assert(TxLog.read(spark, t).as[(Long, String, String, Double)]
      .collect().toSet == before)
  }

  test("compact targeted at one partition leaves other partitions' files alone") {
    val t = tmpTable()
    TxLog.overwrite(sample, t, partitionBy = Some(Seq("yr")))
    (1 to 3).foreach(i =>
      TxLog.append(Seq((200L + i, "2024", "c", i.toDouble))
        .toDF("id", "yr", "grp", "v"), t))
    val before = TxLog.manifest(spark, t)
    val other = before.files.filterNot(_.contains("__gp_yr=2024")).toSet
    val n2024 = before.files.count(_.contains("__gp_yr=2024"))
    val rows = TxLog.read(spark, t).as[(Long, String, String, Double)].collect().toSet
    TxLog.compact(spark, t, smallFileBytes = 10L << 20,
      partition = Map("yr" -> "2024"))
    val after = TxLog.manifest(spark, t)
    // 2025/2026 files untouched by path; 2024's small-file debt packed
    assert(other.subsetOf(after.files.toSet))
    assert(after.files.count(_.contains("__gp_yr=2024")) < n2024)
    assert(TxLog.read(spark, t).as[(Long, String, String, Double)]
      .collect().toSet == rows)
  }

  test("restore rolls the partition layout back with the data") {
    val t = tmpTable()
    TxLog.overwrite(sample.select("id", "v"), t) // v1: flat
    TxLog.overwrite(sample, t, partitionBy = Some(Seq("yr"))) // v2: partitioned
    TxLog.restore(spark, t, 1L)
    assert(TxLog.tablePartitionBy(spark, t).isEmpty)
    assert(TxLog.read(spark, t).columns.toSeq == Seq("id", "v"))
    TxLog.restore(spark, t, 2L)
    assert(TxLog.tablePartitionBy(spark, t) == Seq("yr"))
    assert(TxLog.partitions(spark, t).count() == 3)
  }

  test("exact partition ops refuse a table with incomplete partition metadata") {
    val t = tmpTable()
    TxLog.overwrite(sample, t) // flat: no parts anywhere
    val e = intercept[RuntimeException] {
      TxLog.overwritePartitions(sample.limit(1), t)
    }
    assert(e.getMessage.contains("not partitioned"))
  }

  test("partition ops record a change feed when asked (replaceWhere+CDF shape)") {
    val t = tmpTable()
    TxLog.overwrite(sample, t, partitionBy = Some(Seq("yr")))
    val v1 = TxLog.manifest(spark, t).version
    // dynamic overwrite of 2024 with CDF: old rows delete, new rows insert
    TxLog.overwritePartitions(
      Seq((9L, "2024", "z", 99.0)).toDF("id", "yr", "grp", "v"), t,
      changeFeed = true)
    // metadata-only drop of 2026 with CDF: pre-images recorded
    TxLog.dropPartitions(spark, t, Map("yr" -> "2026"), changeFeed = true)
    val feed = TxLog.readChangeFeed(spark, t, sinceVersion = v1)
      .select(col("id"), col("yr"), col("_change_type"))
      .as[(Long, String, String)].collect().toSet
    assert(feed == Set(
      (1L, "2024", "delete"), (2L, "2024", "delete"), (9L, "2024", "insert"),
      (5L, "2026", "delete")))
    // without changeFeed the feed refuses the unrecorded rewrite
    val t2 = tmpTable()
    TxLog.overwrite(sample, t2, partitionBy = Some(Seq("yr")))
    val v = TxLog.manifest(spark, t2).version
    TxLog.dropPartitions(spark, t2, Map("yr" -> "2024"))
    val e = intercept[RuntimeException] {
      TxLog.readChangeFeed(spark, t2, sinceVersion = v).collect()
    }
    assert(e.getMessage.contains("no recorded change"))
  }

  test("streaming sink appends inherit the partition layout") {
    import org.apache.spark.sql.streaming.Trigger
    val src = tmpTable()
    val dst = tmpTable()
    TxLog.overwrite(Seq((1L, "2024"), (2L, "2025")).toDF("id", "yr"), src)
    // destination created partitioned up front; the sink's idempotent
    // appends must land Hive-partitioned without being told
    TxLog.overwrite(Seq((0L, "2023")).toDF("id", "yr"), dst,
      partitionBy = Some(Seq("yr")))
    val q = spark.readStream.format("graft-txlog").option("path", src).load()
      .writeStream.format("graft-txlog")
      .option("path", dst)
      .option("txnAppId", "txpart-sink-spec")
      .option("checkpointLocation",
        Files.createTempDirectory("txpart-cp").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val m = TxLog.manifest(spark, dst)
    assert(m.partitionBy.contains(Seq("yr")))
    assert(m.stats.get.forall(_.parts.isDefined))
    assert(TxLog.partitions(spark, dst).count() == 3)
    assert(TxLog.readPartition(spark, dst, Map("yr" -> "2025"))
      .select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("batch writer option partitionBy lays the table out partitioned") {
    val t = tmpTable()
    sample.write.format("graft-txlog")
      .option("path", t).option("partitionBy", "yr")
      .mode("overwrite").save()
    assert(TxLog.tablePartitionBy(spark, t) == Seq("yr"))
    assert(TxLog.partitions(spark, t).count() == 3)
    // append without the option inherits; with a WRONG option fails loud
    Seq((6L, "2026", "b", 60.0)).toDF("id", "yr", "grp", "v")
      .write.format("graft-txlog").option("path", t).mode("append").save()
    assert(TxLog.read(spark, t).count() == 6)
    assert(TxLog.manifest(spark, t).stats.get.forall(_.parts.isDefined))
    val e = intercept[IllegalArgumentException] {
      Seq((7L, "2026", "c", 70.0)).toDF("id", "yr", "grp", "v")
        .write.format("graft-txlog").option("path", t)
        .option("partitionBy", "grp").mode("append").save()
    }
    assert(e.getMessage.contains("does not match"))
  }

  test("streaming sink partitionBy creates a partitioned table") {
    import org.apache.spark.sql.streaming.Trigger
    val src = tmpTable()
    val dst = tmpTable()
    TxLog.overwrite(Seq((1L, "2024"), (2L, "2025")).toDF("id", "yr"), src)
    val q = spark.readStream.format("graft-txlog").option("path", src).load()
      .writeStream.format("graft-txlog")
      .partitionBy("yr")
      .option("path", dst)
      .option("txnAppId", "txpart-create-sink")
      .option("checkpointLocation",
        Files.createTempDirectory("txpart-cp2").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(TxLog.tablePartitionBy(spark, dst) == Seq("yr"))
    assert(TxLog.readPartition(spark, dst, Map("yr" -> "2024"))
      .select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("graft_tx_partitions TVF matches the Scala partitions() surface") {
    val t = tmpTable()
    TxLog.overwrite(sample, t, partitionBy = Some(Seq("yr")))
    val viaSql = spark.sql(
        s"SELECT yr, rows FROM graft_tx_partitions('$t') ORDER BY yr")
      .as[(String, Long)].collect().toSeq
    assert(viaSql == Seq(("2024", 2L), ("2025", 2L), ("2026", 1L)))
  }

  test("partition values with special characters escape and unescape") {
    val t = tmpTable()
    val df = Seq((1L, "a/b"), (2L, "c:d"), (3L, "plain")).toDF("id", "k")
    TxLog.overwrite(df, t, partitionBy = Some(Seq("k")))
    val vals = TxLog.manifest(spark, t).stats.get
      .flatMap(_.parts.get.get("k")).toSet
    assert(vals == Set("a/b", "c:d", "plain"))
    assert(TxLog.readPartition(spark, t, Map("k" -> "a/b"))
      .select("id").as[Long].collect().toSeq == Seq(1L))
    assert(TxLog.read(spark, t).count() == 3)
  }
}
