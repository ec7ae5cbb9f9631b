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

  test("semDedup verdicts agree with an in-list brute force") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sfDir)
    // tau below d15's 0.35: the sf0.001 spec corpus tops out at cos 0.48
    // and the differential needs both verdicts present
    val out = IvfAnn.semDedup(e, nlist = 16, tau = 0.3)
      .as[(Long, Long, Boolean)].collect()
    assert(out.length == e.count()) // a verdict for every vector
    assert(out.exists(_._3) && out.exists(!_._3))

    // brute-force recompute: is_dup(v) <=> exists u in same list, u < v,
    // cos(u, v) >= tau
    val lists = out.map(r => r._1 -> r._2).toMap
    val vecs = e.select(col("vec_id"),
        col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.lazyZip(b).map(_ * _).sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val byList = lists.keys.groupBy(lists)
    out.foreach { case (v, c, dup) =>
      val expected = byList(c).exists(u => u < v && cos(vecs(u), vecs(v)) >= 0.3 - 1e-9)
      // 1e-9 slack: spec-side cosine sums in a different order than the
      // codegen'd dot; only exact-boundary vectors could flip, none exist
      assert(dup == expected, s"vec $v list $c: got $dup expected $expected")
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
