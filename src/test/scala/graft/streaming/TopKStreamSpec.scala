package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class TopKStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("bounded TopKStream matches the batch TopKPerKey operator (rank included)") {
    val events = Tables.events(spark, sfDir)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[TopKStream.Event]
    val streamed = TopKStream.topK(events, k = 3)
      .select("user_id", "rank", "event_id", "value")
      .as[(Long, Int, Long, Double)].collect().toSet
    val batch = graft.plans.TopKPerKey.withRank(
        Tables.events(spark, sfDir), Seq(col("user_id")),
        Seq(col("value").desc, col("event_id")), k = 3, "rank")
      .select(col("user_id"), col("rank").cast("int"), col("event_id"), col("value"))
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming top-k state merges across micro-batches and re-emits the refreshed ranking") {
    val dir = Files.createTempDirectory("topk-stream")
    def writeBatch(rows: Seq[(Long, Timestamp, Long, String, Double)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit(""))
        .coalesce(1).write.mode("append").parquet(dir.toString)

    writeBatch(Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 10.0),
      (2L, ts("2024-01-01 10:01:00"), 1L, "click", 20.0),
      (3L, ts("2024-01-01 10:02:00"), 1L, "click", 5.0)))

    val q = TopKStream.topK(
      EventStream.read(spark, dir.toString)
        .selectExpr("event_id", "ts", "user_id", "event_type", "value")
        .as[TopKStream.Event], k = 2)
      .writeStream.format("memory").queryName("topk_out")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      // after batch 1: top-2 of {10, 20, 5} = (20 rank 1, 10 rank 2)
      val b1 = spark.table("topk_out")
        .select("rank", "event_id").as[(Int, Long)].collect().toSet
      assert(b1 == Set((1, 2L), (2, 1L)))

      // batch 2: 30 takes rank 1, 5 is ignored (below the retained k)
      writeBatch(Seq(
        (4L, ts("2024-01-01 10:03:00"), 1L, "click", 30.0),
        (5L, ts("2024-01-01 10:04:00"), 1L, "click", 1.0)))
      q.processAllAvailable()
      val all = spark.table("topk_out")
        .select("rank", "event_id").as[(Int, Long)].collect()
      // the refreshed ranking emitted in batch 2
      assert(all.count { case (r, id) => (r, id) == (1, 4L) } == 1)
      assert(all.count { case (r, id) => (r, id) == (2, 2L) } == 1)
      // event 1 (value 10) was evicted from the top-2 — emitted only in batch 1
      assert(all.count(_._2 == 1L) == 1)
    } finally q.stop()
  }
}
