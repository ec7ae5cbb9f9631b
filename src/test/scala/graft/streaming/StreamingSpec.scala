package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.streaming.Trigger

import graft.{SparkSpec, Tables}
import graft.queries.Core

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming tumbling agg matches the batch q22 result (memory sink parity)") {
    // Materialize the sf0.001 events (micros ts) as the stream input.
    val dir = Files.createTempDirectory("evstream").toString
    Tables.events(spark, sfDir).write.mode("overwrite").parquet(dir)

    val q = EventStream.tumbling(EventStream.read(spark, dir))
      .writeStream.format("memory").queryName("tumble_parity")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("tumble_parity")
      .select("bucket", "event_type", "n", "sum_v")
      .as[(String, String, Long, Double)].collect().toSet
    val batch = Core.defs("q22_window_tumble")(spark, sfDir)
      .as[(String, String, Long, Double)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("sessionize splits a user's events on the gap and aggregates each session") {
    val events = Seq(
      Sessionize.Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Sessionize.Event(2, ts("2024-01-01 10:10:00"), 1, "click", 2.0),
      // 50 min gap > 30 min -> new session
      Sessionize.Event(3, ts("2024-01-01 11:00:00"), 1, "purchase", 3.0),
      // other user, one session
      Sessionize.Event(4, ts("2024-01-01 10:00:00"), 2, "click", 5.0),
      // closes user 1's second session via another gap
      Sessionize.Event(5, ts("2024-01-01 12:00:00"), 1, "click", 7.0)
    ).toDS()

    // Batch mode: gaps inside the data close sessions; the final open
    // session per user is retained in state (not emitted).
    val out = Sessionize.sessionize(events, gapSeconds = 30 * 60).collect()
    assert(out.length == 2)
    val first = out.find(_.session_start == ts("2024-01-01 10:00:00")).get
    assert(first.user_id == 1 && first.n_events == 2 && first.total_value == 3.0
      && first.duration_sec == 600)
    val second = out.find(_.session_start == ts("2024-01-01 11:00:00")).get
    assert(second.user_id == 1 && second.n_events == 1 && second.total_value == 3.0)
  }

  test("streaming sessionize closes sessions via the event-time timeout across batches") {
    val dir = Files.createTempDirectory("sess-stream")
    def writeBatch(file: String, rows: Seq[Sessionize.Event]): Unit =
      rows.toDS().toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", org.apache.spark.sql.functions.lit(""))
        .coalesce(1).write.mode("append").parquet(dir.toString)

    writeBatch("b1", Seq(
      Sessionize.Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
      Sessionize.Event(2, ts("2024-01-01 10:05:00"), 7, "click", 2.0)))

    val sessions = Sessionize.sessionize(
      EventStream.read(spark, dir.toString)
        .selectExpr("event_id", "ts", "user_id", "event_type", "value")
        .as[Sessionize.Event]
        .withWatermark("ts", "10 seconds"),
      gapSeconds = 600)
    val q = sessions.writeStream.format("memory").queryName("sess_timeout")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("sess_timeout").count() == 0) // session still open

      // Batch 2 advances the watermark past end+gap -> timeout fires.
      writeBatch("b2", Seq(
        Sessionize.Event(9, ts("2024-01-01 12:00:00"), 8, "click", 9.0)))
      q.processAllAvailable()
      // one more batch so the timeout registered after batch 2 executes
      writeBatch("b3", Seq(
        Sessionize.Event(10, ts("2024-01-01 12:30:00"), 8, "click", 1.0)))
      q.processAllAvailable()

      val closed = spark.table("sess_timeout")
        .as[Sessionize.Session].collect().filter(_.user_id == 7L)
      assert(closed.length == 1)
      assert(closed.head.n_events == 2 && closed.head.total_value == 3.0)
    } finally q.stop()
  }

  test("streaming dedup drops re-delivered event_ids within the watermark") {
    val dir = Files.createTempDirectory("dedup-stream")
    def writeBatch(rows: Seq[(Long, Timestamp, Long, String, Double)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", org.apache.spark.sql.functions.lit(""))
        .coalesce(1).write.mode("append").parquet(dir.toString)

    writeBatch(Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
      (2L, ts("2024-01-01 10:01:00"), 1L, "click", 2.0)))

    val q = EventStream.dedupStream(EventStream.read(spark, dir.toString))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // re-delivery of event 2 (at-least-once source) + a new event
      writeBatch(Seq(
        (2L, ts("2024-01-01 10:01:00"), 1L, "click", 2.0),
        (3L, ts("2024-01-01 10:02:00"), 2L, "view", 3.0)))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id").as[Long].collect().toSeq
      assert(ids.sorted == Seq(1L, 2L, 3L)) // each exactly once
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch join of the same frames") {
    val dir = Files.createTempDirectory("ssj").toString
    Tables.events(spark, sfDir).write.mode("overwrite").parquet(dir)

    val q = EventStream.purchaseClickJoin(EventStream.read(spark, dir))
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("ssj_out")
      .select("p_id", "c_id").as[(Long, Long)].collect().toSet
    val batch = EventStream.purchaseClickJoin(Tables.events(spark, sfDir))
      .select("p_id", "c_id").as[(Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stream-stream LEFT OUTER interval join: matched pairs equal the inner join; watermark-released null rows agree with batch") {
    val dir = Files.createTempDirectory("ssloj").toString
    Tables.events(spark, sfDir).write.mode("overwrite").parquet(dir)

    val q = EventStream.purchaseClickJoin(EventStream.read(spark, dir), joinType = "left_outer")
      .writeStream.format("memory").queryName("ssloj_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("ssloj_out")
    val batchOuter = EventStream.purchaseClickJoin(
      Tables.events(spark, sfDir), joinType = "left_outer")

    // Matched pairs emit immediately — exactly the inner join, both modes.
    val streamedMatched = streamed.filter("c_id IS NOT NULL")
      .select("p_id", "c_id").as[(Long, Long)].collect().toSet
    val batchInner = EventStream.purchaseClickJoin(Tables.events(spark, sfDir))
      .select("p_id", "c_id").as[(Long, Long)].collect().toSet
    assert(streamedMatched == batchInner)

    // Null rows emit only once the watermark clears the purchase's join
    // range, so streaming emits a (non-strict) subset of the batch null
    // rows — and for this bounded input, a non-empty one.
    val streamedNulls = streamed.filter("c_id IS NULL")
      .select("p_id").as[Long].collect().toSet
    val batchNulls = batchOuter.filter("c_id IS NULL")
      .select("p_id").as[Long].collect().toSet
    assert(streamedNulls.nonEmpty)
    assert(streamedNulls.subsetOf(batchNulls))
    // and every purchase appears in the batch outer result exactly once
    // per matching click, plus once when unmatched
    assert(batchOuter.count() == batchInner.size + batchNulls.size)
  }

  test("batch sessionize query agrees with the stateful Sessionize operator") {
    // q32 emits every session; batch-mode Sessionize emits all but the
    // final open session per user — so counts differ by #users.
    val q32 = Core.defs("q32_sessionize_batch")(spark, sfDir)
    val events = graft.Tables.events(spark, sfDir)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Sessionize.Event]
    val closed = Sessionize.sessionize(events, gapSeconds = 30 * 60)
    val nUsers = events.map(_.user_id).distinct().count()
    assert(q32.count() == closed.count() + nUsers)
  }

  test("sliding window agg runs on a bounded frame") {
    val df = Seq(
      (1L, ts("2024-01-01 10:05:00"), 1L, "click", 10.0, ""),
      (2L, ts("2024-01-01 10:35:00"), 1L, "click", 20.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventStream.sliding(df).as[(String, Long, Long, Double)].collect()
    // event 1 belongs to windows starting 09:30 and 10:00; event 2 to 10:00 and 10:30
    assert(out.length == 3)
    val w10 = out.find(_._1 == "2024-01-01 10:00:00").get
    assert(w10._3 == 2 && w10._4 == 15.0)
  }
}
