package graft.similarity

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.queries.LlmData

class PqAnnSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Tables.embeddings(spark, sfDir)

  test("codebooks: m x ksub entries, each of subvector width") {
    val cb = PqAnn.trainCodebooks(corpus, dim = 64, m = 8, ksub = 16, maxIter = 5)
      .as[(Int, Int, Seq[Double])].collect()
    assert(cb.length == 8 * 16)
    assert(cb.forall(_._3.length == 8)) // dsub = 64/8
    val perSub = cb.groupBy(_._1)
    assert(perSub.keySet == (0 until 8).toSet)
    assert(perSub.values.forall(_.map(_._2).sorted.toSeq == (0 until 16)))
  }

  test("encode: one code per (vector, subspace), codes within ksub") {
    val cb = PqAnn.codebooksFor(corpus, sfDir, dim = 64, m = 8, ksub = 16)
    val codes = PqAnn.encode(corpus, cb, dim = 64, m = 8)
      .as[(Long, Int, Int)].collect()
    val n = corpus.count()
    assert(codes.length == n * 8)
    assert(codes.forall(c => c._3 >= 0 && c._3 < 16))
    // deterministic: re-encoding yields the identical code table
    val again = PqAnn.encode(corpus, cb, dim = 64, m = 8)
      .as[(Long, Int, Int)].collect()
    assert(codes.toSet == again.toSet)
  }

  test("refined search recall against the exact brute-force top-5 (d05)") {
    val exact = LlmData.defs("d05_cosine_topk")(spark, sfDir)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val pq = LlmData.defs("d22_ann_pq")(spark, sfDir)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val recall = (exact & pq).size.toDouble / exact.size
    info(f"PQ+refine recall@5 vs exact: $recall%.3f (${(exact & pq).size}/${exact.size})")
    // ADC winnows to a 40-candidate shortlist, exact cosine re-ranks:
    // recall@5 equals ADC's recall@40, far above the raw-ADC 0.42
    assert(recall > 0.7, s"PQ refined recall $recall")
    // contract shape: <= k rows per query, dense ranks, self excluded
    val full = LlmData.defs("d22_ann_pq")(spark, sfDir)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect()
    full.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length <= 5)
      assert(rows.forall(_._2 != q))
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
  }

  test("IVFPQ composition: recall within the probed-list ceiling, contract shape") {
    val exact = LlmData.defs("d05_cosine_topk")(spark, sfDir)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val ivfpq = LlmData.defs("d24_ann_ivfpq")(spark, sfDir)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect()
    val got = ivfpq.map(r => (r._1, r._2)).toSet
    val recall = (exact & got).size.toDouble / exact.size
    info(f"IVFPQ recall@5 vs exact: $recall%.3f (${(exact & got).size}/${exact.size})")
    // the PQ stage may only SHRINK the IVF candidate set: every IVFPQ
    // hit must be reachable under the same probes, so d08 (same
    // nlist/nprobe, full-precision scoring) is the recall CEILING —
    // and the 40-candidate ADC shortlist + exact re-rank should give
    // back nearly everything probing admits
    val ivf = LlmData.defs("d08_ann_ivf")(spark, sfDir)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val ivfRecall = (exact & ivf).size.toDouble / exact.size
    info(f"IVF-only recall@5 at equal nlist/nprobe: $ivfRecall%.3f")
    assert(recall <= ivfRecall + 1e-9,
      s"IVFPQ recall $recall exceeds its probing ceiling $ivfRecall")
    assert(recall >= ivfRecall - 0.15,
      s"IVFPQ recall $recall lost more than 0.15 to its ceiling $ivfRecall")
    assert(recall >= 0.4, s"IVFPQ recall $recall")
    // contract shape: <= k rows per query, dense ranks, self excluded
    ivfpq.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length <= 5)
      assert(rows.forall(_._2 != q))
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
  }

  test("quantized cosine tracks the exact cosine") {
    // ADC's approx_cos should correlate with the true cosine on the
    // pairs it returns — a sanity bound on quantization error
    val e = corpus
    val cb = PqAnn.codebooksFor(e, sfDir, dim = 64, m = 8, ksub = 16)
    val codes = PqAnn.encode(e, cb, dim = 64, m = 8)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val approx = PqAnn.search(q, cb, codes, dim = 64, m = 8, k = 5)
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("ce"))
    val joined = approx.join(q, Seq("q_id")).join(c, Seq("c_id"))
      .select(col("approx_cos"),
        graft.functions.VecFns.cosine(col("qe"), col("ce")).as("exact_cos"))
      .as[(Double, Double)].collect()
    assert(joined.nonEmpty)
    val mae = joined.map { case (a, x) => math.abs(a - x) }.sum / joined.length
    info(f"mean |approx - exact| over returned pairs: $mae%.4f")
    assert(mae < 0.25, f"quantization MAE $mae%.4f too large")
  }
}
