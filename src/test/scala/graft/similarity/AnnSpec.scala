package graft.similarity

import graft.{SparkSpec, Tables}
import graft.queries.LlmData

class AnnSpec extends SparkSpec {
  import spark.implicits._

  test("IVF ANN returns at most k deterministic neighbors per query, self excluded") {
    val out = IvfAnn.topK(Tables.embeddings(spark, sfDir),
      nQueries = 5, k = 3, nlist = 16, nprobe = 4)
      .as[(Long, Long, Int, Double)].collect()
    assert(out.nonEmpty)
    val byQ = out.groupBy(_._1)
    byQ.foreach { case (q, rows) =>
      assert(rows.length <= 3)
      assert(rows.forall(_._2 != q))
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
    val again = IvfAnn.topK(Tables.embeddings(spark, sfDir),
      nQueries = 5, k = 3, nlist = 16, nprobe = 4)
      .as[(Long, Long, Int, Double)].collect()
    assert(out.toSet == again.toSet)
  }

  test("approx sketch aggregates land within tolerance of exact") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir)
    val approx = LlmData.defs("q28_approx_stats")(spark, sfDir)
      .select("event_type", "approx_users").as[(String, Long)].collect().toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("u"))
      .select("event_type", "u").as[(String, Long)].collect().toMap
    exact.foreach { case (t, u) =>
      val a = approx(t)
      assert(math.abs(a - u).toDouble / u < 0.1, s"$t approx=$a exact=$u")
    }
  }

  test("ANN variants recall against brute-force top-5") {
    val exact = LlmData.defs("d05_cosine_topk")(spark, sfDir)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val ivf = LlmData.defs("d08_ann_ivf")(spark, sfDir)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    // approximate by construction; just assert it finds a real fraction
    assert(recall > 0.2, s"IVF recall $recall")
  }
}
