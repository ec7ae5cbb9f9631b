package graft.similarity

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.VecFns
import graft.queries.LlmData

/** Scale-safety specs for the near-dup paths: the d02 hot-shingle cap and
  * the d06 LSH-bucket blocking (recall + exactness vs brute force).
  */
class NearDupSpec extends SparkSpec {
  import spark.implicits._

  private def syntheticDocs(n: Int): org.apache.spark.sql.DataFrame =
    (0 until n).map { i =>
      // Every doc shares the leading 4 tokens (=> the shared 3-gram
      // "common common common" appears in all n docs); the tail is unique.
      (i.toLong, s"common common common common u${i}a u${i}b u${i}c u${i}d")
    }.toDF("doc_id", "text")

  test("d02 candidate pairs are quadratic without the df cap, bounded with it") {
    val docs = syntheticDocs(60)
    val uncapped = NgramJaccard.candidatePairs(
      NgramJaccard.cappedShingleKeys(docs, maxDf = Int.MaxValue)).count()
    // every pair of docs shares the hot shingle: C(60,2) candidates
    assert(uncapped == 60L * 59 / 2, s"uncapped=$uncapped")
    val capped = NgramJaccard.candidatePairs(
      NgramJaccard.cappedShingleKeys(docs, maxDf = 10)).count()
    // the only shared shingle has df=60 > 10, so no candidates survive
    assert(capped == 0L, s"capped=$capped")
  }

  test("d02 df cap leaves real near-dup pairs intact on testdata") {
    val docs = Tables.documents(spark, sfDir)
    val capped = NgramJaccard.pairs(docs, minJaccard = 0.6, maxDf = 100)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val uncapped = NgramJaccard.pairs(docs, minJaccard = 0.6, maxDf = Int.MaxValue)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // testdata has no df>100 shingle at this sf, so the cap is a no-op here
    assert(capped == uncapped)
    assert(capped.nonEmpty)
  }

  /** Brute-force ground truth: ALL pairs with cos >= tau (no blocking). */
  private def bruteForcePairs(tau: Double): Set[(Long, Long)] = {
    val e = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", VecFns.cosine(col("a.embedding"), col("b.embedding")))
      .filter(col("cos") >= tau)
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"))
      .as[(Long, Long)].collect().toSet
  }

  test("d06 LSH-blocked near-dups: perfect precision, usable recall vs brute force") {
    val truth = bruteForcePairs(0.35)
    val lsh = LlmData.defs("d06_embedding_neardup")(spark, sfDir)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "ground truth empty — threshold no longer meaningful")
    // the exact-cosine filter after blocking means no false positives, ever
    assert((lsh -- truth).isEmpty, s"false positives: ${(lsh -- truth).take(5)}")
    val recall = (lsh & truth).size.toDouble / truth.size
    // 6 bands × 3 planes: expected recall ≈ 1-(1-p³)⁶ ≈ 0.8 at cos = 0.35
    // exactly, higher for closer pairs; assert a conservative floor
    assert(recall >= 0.5, s"recall=$recall truth=${truth.size} lsh=${lsh.size}")
  }

  test("banded LSH ANN (d07) recall beats single-table at equal total planes") {
    val e = Tables.embeddings(spark, sfDir)
    val exact = LlmData.defs("d05_cosine_topk")(spark, sfDir)
      .filter(col("rank") <= 3).select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val banded = LshAnn.topKBanded(e, bands = 6, planesPerBand = 3, k = 3)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val single = LshAnn.topK(e, planes = 18, k = 3)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val rb = (banded & exact).size.toDouble / exact.size
    val rs = (single & exact).size.toDouble / exact.size
    info(f"banded recall=$rb%.2f single(18-plane) recall=$rs%.2f")
    assert(rb >= 0.5, s"banded recall=$rb")
    assert(rb > rs, "banding should dominate one deep table at equal plane budget")
  }

  test("LSH plane sweep: more planes -> smaller buckets (scale knob), recall trades off") {
    val e = Tables.embeddings(spark, sfDir)
    val exact = LlmData.defs("d05_cosine_topk")(spark, sfDir)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val stats = Seq(6, 10, 14).map { planes =>
      val buckets = e.select(LshAnn.bucket(col("embedding"), planes, 64).as("bkt"))
        .groupBy("bkt").count().select("count").as[Long].collect()
      val ann = LshAnn.topK(e, planes, k = 5)
        .select("q_id", "c_id").as[(Long, Long)].collect().toSet
      val exactQ = exact // top-5 of queries 0..9
      val recall = if (exactQ.isEmpty) 0.0
        else (ann & exactQ).size.toDouble / exactQ.size
      (planes, buckets.length, buckets.max, recall)
    }
    info(stats.map { case (p, nb, mx, r) =>
      s"planes=$p buckets=$nb maxPop=$mx recall=${"%.2f".format(r)}" }.mkString("; "))
    // the scale knob must work: growing planes strictly spreads the corpus
    assert(stats(0)._2 < stats(1)._2 && stats(1)._2 <= stats(2)._2,
      s"bucket counts not increasing: $stats")
    assert(stats(0)._3 >= stats(1)._3 && stats(1)._3 >= stats(2)._3,
      s"max bucket population not shrinking: $stats")
  }
}
