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

  test("trained quantizer: recall and candidate cost vs the sample quantizer") {
    import org.apache.spark.sql.functions.{col, sum}
    val e = Tables.embeddings(spark, sfDir)
    val n = e.count().toDouble
    val nq = 50 // 250 exact pairs — recall at 10 queries is noise-bound
    // exact top-5 via exhaustive probing: nprobe = nlist scans every
    // inverted list, so the quantizer cancels out of the reference
    val exact = IvfAnn.topK(e, nQueries = nq, k = 5, nlist = 16, nprobe = 16,
        centroids = Some(IvfAnn.sampleCentroids(e, 16)))
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    // per quantizer: recall, candidates scanned (Σ over (query, probed
    // list) of list size), and the largest inverted list
    def stats(cents: org.apache.spark.sql.DataFrame): (Double, Long, Long) = {
      val got = IvfAnn.topK(e, nQueries = nq, k = 5, nlist = 16, nprobe = 4,
          centroids = Some(cents))
        .select("q_id", "c_id").as[(Long, Long)].collect().toSet
      val recall = (exact & got).size.toDouble / exact.size
      val sizes = IvfAnn.assign(e, cents)
        .groupBy("cent_id").count().select("count").as[Long].collect()
      val qs = e.filter(col("vec_id") < nq)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      val cands = IvfAnn.probes(qs, cents, nprobe = 4)
        .join(IvfAnn.assign(e, cents).groupBy("cent_id").count(), Seq("cent_id"))
        .agg(sum("count")).as[Long].head()
      (recall, cands, sizes.max)
    }
    val (rT, cT, maxT) = stats(IvfAnn.trainCentroids(e, nlist = 16))
    val (rS, cS, maxS) = stats(IvfAnn.sampleCentroids(e, nlist = 16))
    // the id<16 sample CONTAINS the 10 query vectors — every query's own
    // list is exactly its neighborhood, an overfit no real quantizer
    // gets; the query-DISJOINT sample below is the honest baseline
    val disjoint = e.filter(col("vec_id") >= 100 && col("vec_id") < 116)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
    val (rD, cD, maxD) = stats(disjoint)
    info(f"trained        : recall=$rT%.3f candidates=$cT maxList=$maxT of ${n.toLong}")
    info(f"sample(queries): recall=$rS%.3f candidates=$cS maxList=$maxS")
    info(f"sample(disjoint): recall=$rD%.3f candidates=$cD maxList=$maxD")
    assert(rT > 0.2, s"trained recall $rT")
    // trained must beat (or tie) a sample that doesn't already contain
    // the queries — the generalizable-quantizer claim
    assert(rT >= rD - 0.05,
      f"trained recall $rT%.3f below query-disjoint sample $rD%.3f")
  }
}
