package graft.operators

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(23L)
  private val rows = Seq.tabulate(3000)(i =>
    (s"k${rnd.nextInt(7)}", BigDecimal(rnd.nextInt(100000)) / 100))
  private def df(s: Seq[(String, BigDecimal)]): DataFrame = s.toDF("k", "v")

  private def collect(state: DataFrame) =
    state.select("k", "n", "sum_v", "min_v", "max_v")
      .as[(String, Long, BigDecimal, BigDecimal, BigDecimal)]
      .collect().toSeq.sortBy(_._1)

  test("folding arbitrary batches equals one-shot recompute") {
    val (b1, rest) = rows.splitAt(1000)
    val (b2, b3) = rest.splitAt(700)
    val folded = Seq(b2, b3).foldLeft(
      Incremental.aggState(df(b1), Seq("k"), col("v"))) { (st, b) =>
      Incremental.merge(st, Incremental.aggState(df(b), Seq("k"), col("v")), Seq("k"))
    }
    val direct = Incremental.aggState(df(rows), Seq("k"), col("v"))
    assert(collect(folded) == collect(direct))
  }

  test("merge is commutative and handles keys absent from either side") {
    // split so some keys exist only in one batch
    val left = rows.filter(_._1 < "k3")
    val right = rows.filterNot(_._1 < "k3") ++ rows.take(50)
    val a = Incremental.aggState(df(left), Seq("k"), col("v"))
    val b = Incremental.aggState(df(right), Seq("k"), col("v"))
    assert(collect(Incremental.merge(a, b, Seq("k"))) ==
      collect(Incremental.merge(b, a, Seq("k"))))
  }

  test("empty delta is the identity") {
    val a = Incremental.aggState(df(rows), Seq("k"), col("v"))
    val empty = Incremental.aggState(df(Nil), Seq("k"), col("v"))
    assert(collect(Incremental.merge(a, empty, Seq("k"))) == collect(a))
  }

  test("cdfDelta + mergeRetract equals recompute through inserts, deletes, updates") {
    val base = rows.take(1500)
    val inserts = rows.slice(1500, 2000)
    val deletes = base.take(300)
    val updates = base.slice(300, 600)
    val feed = (inserts.map { case (k, v) => (k, v, "insert") } ++
      deletes.map { case (k, v) => (k, v, "delete") } ++
      updates.flatMap { case (k, v) =>
        Seq((k, v, "update_preimage"), (k, v * 2, "update_postimage")) })
      .toDF("k", "v", "_change_type")
    val folded = Incremental.mergeRetract(
      Incremental.aggRetractState(df(base), Seq("k"), col("v")),
      Incremental.cdfDelta(feed, Seq("k"), col("v")), Seq("k"))
    val finalRows = base.drop(600) ++ updates.map { case (k, v) => (k, v * 2) } ++ inserts
    val direct = Incremental.aggRetractState(df(finalRows), Seq("k"), col("v"))
    def snap(s: DataFrame) = s.select("k", "rows", "n", "sum_v")
      .as[(String, Long, Long, BigDecimal)].collect().toSeq.sortBy(_._1)
    assert(snap(folded) == snap(direct))
  }

  test("full retraction drops the key; all-NULL keys survive with NULL sum") {
    val state = Incremental.aggRetractState(
      Seq(("a", Some(BigDecimal(1))), ("b", None)).toDF("k", "v"),
      Seq("k"), col("v"))
    val feed = Seq(
      ("a", Some(BigDecimal(1)), "delete"),
      ("c", Option.empty[BigDecimal], "insert")).toDF("k", "v", "_change_type")
    val folded = Incremental.mergeRetract(state,
      Incremental.cdfDelta(feed, Seq("k"), col("v")), Seq("k"))
    val got = folded.select("k", "rows", "n")
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    // "a" fully retracted -> gone; "b"/"c" exist with zero non-NULL values
    assert(got == Seq(("b", 1L, 0L), ("c", 1L, 0L)))
    assert(folded.filter(col("sum_v").isNotNull).count() == 0)
  }

  test("an unknown change type fails the fold loudly") {
    val feed = Seq(("a", BigDecimal(1), "upsert")).toDF("k", "v", "_change_type")
    val e = intercept[Exception] {
      Incremental.cdfDelta(feed, Seq("k"), col("v")).collect()
    }
    assert(e.getMessage.contains("unknown _change_type") ||
      Option(e.getCause).exists(_.getMessage.contains("unknown _change_type")),
      e.getMessage)
  }

  test("missing state columns fail loudly") {
    val a = Incremental.aggState(df(rows), Seq("k"), col("v"))
    val e = intercept[IllegalArgumentException] {
      Incremental.merge(a, df(rows), Seq("k"))
    }
    assert(e.getMessage.contains("state columns"))
  }

  test("streaming foreachBatch fold equals one-shot recompute over all batches") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("inc-stream").toString
    val (b1, b2) = rows.splitAt(1200)
    def write(b: Seq[(String, BigDecimal)]): Unit =
      df(b).coalesce(1).write.mode("append").parquet(dir)
    write(b1)

    val folder = new Incremental.Folder(Seq("k"), col("v"))
    val schema = df(rows.take(1)).schema
    val q = spark.readStream.schema(schema).parquet(dir)
      .writeStream.foreachBatch(
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          folder.fold(batch.toDF(), id))
      .start()
    try {
      q.processAllAvailable()
      write(b2)
      q.processAllAvailable()
      val folded = collect(folder.current.get)
      val direct = collect(Incremental.aggState(df(rows), Seq("k"), col("v")))
      assert(folded == direct)
    } finally {
      q.stop()
      folder.close()
    }
  }

  test("a re-delivered micro-batch (same batchId) is not folded twice") {
    val folder = new Incremental.Folder(Seq("k"), col("v"))
    try {
      folder.fold(df(rows.take(100)), batchId = 0L)
      val once = collect(folder.current.get)
      folder.fold(df(rows.take(100)), batchId = 0L) // at-least-once redelivery
      assert(collect(folder.current.get) == once)
      folder.fold(df(rows.slice(100, 200)), batchId = 1L) // next batch still folds
      assert(collect(folder.current.get) ==
        collect(Incremental.aggState(df(rows.take(200)), Seq("k"), col("v"))))
    } finally folder.close()
  }

  test("keys observed only with NULL values merge to NULL sum, like a recompute") {
    val withNulls = Seq(("a", Some(BigDecimal(1))), ("b", None), ("b", None))
    def d(s: Seq[(String, Option[BigDecimal])]) = s.toDF("k", "v")
    val merged = Incremental.merge(
      Incremental.aggState(d(withNulls.take(2)), Seq("k"), col("v")),
      Incremental.aggState(d(withNulls.drop(2)), Seq("k"), col("v")), Seq("k"))
    val direct = Incremental.aggState(d(withNulls), Seq("k"), col("v"))
    val m = merged.select("k", "n", "sum_v")
      .as[(String, Long, Option[BigDecimal])].collect().toSeq.sortBy(_._1)
    val r = direct.select("k", "n", "sum_v")
      .as[(String, Long, Option[BigDecimal])].collect().toSeq.sortBy(_._1)
    assert(m == r)
    assert(m.find(_._1 == "b").get._3.isEmpty, "all-NULL key must keep NULL sum")
  }

  test("merged sum keeps the aggregate's decimal(28,4) headroom") {
    val a = Incremental.aggState(df(rows), Seq("k"), col("v"))
    val m = Incremental.merge(a, a, Seq("k"))
    assert(m.schema("sum_v").dataType ==
      org.apache.spark.sql.types.DecimalType(28, 4), m.schema("sum_v").dataType)
  }

  test("derived average equals sum over count exactly") {
    val a = Incremental.withAvg(Incremental.aggState(df(rows), Seq("k"), col("v")))
    val bad = a.filter(
      col("avg_v") =!= col("sum_v").cast("double") / col("n")).count()
    assert(bad == 0L)
  }
}
