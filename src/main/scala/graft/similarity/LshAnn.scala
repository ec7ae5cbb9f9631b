package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecFns

/** Random-hyperplane LSH approximate-nearest-neighbor search.
  *
  * Scale path for brute-force cosine top-k (`d05_cosine_topk`): instead of
  * comparing every query against every candidate (O(n²) at 100 TB), each
  * vector is reduced to a `planes`-bit signature — bit j is the sign of the
  * dot product with deterministic hyperplane j — and candidates are only
  * compared within the same signature bucket (equi-join on the bucket id,
  * one shuffle, no cross join). Recall < 1 by construction, so this query
  * is checked rows-only, not value-equality, against the oracle.
  *
  * Hyperplanes are derived from a fixed-seed generator so results are
  * reproducible across runs and engines.
  */
object LshAnn {

  /** Deterministic unit-free hyperplanes: `planes` × `dim` doubles from a
    * fixed-seed xorshift-style generator (no java.util.Random so behavior
    * is pinned by this file alone).
    */
  private[similarity] def hyperplanes(planes: Int, dim: Int): Seq[Seq[Double]] = {
    var state = 0x9e3779b97f4a7c15L
    def next(): Double = {
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      // 53-bit mantissa / 2^53 -> [0, 1), then map to [-1, 1). (Dividing
      // the 53-bit value by 2^52 would give [0, 2) and bias every
      // component positive — all planes would then share a common
      // sum-of-components term and signatures would collapse into a few
      // hot buckets.)
      (state >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    Seq.fill(planes)(Seq.fill(dim)(next()))
  }

  /** Signature bucket id of `vec` (array<float|double>) under `planes`
    * fixed hyperplanes of dimension `dim`.
    */
  def bucket(vec: Column, planes: Int, dim: Int): Column = {
    val hp = hyperplanes(planes, dim)
    val vd = VecFns.asDouble(vec)
    hp.zipWithIndex.map { case (p, j) =>
      val planeLit = array(p.map(lit): _*)
      when(VecFns.dot(vd, planeLit) >= 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Bucketed ANN top-k: join vectors within each LSH bucket, score with
    * exact cosine, keep the top `k` neighbors per query by (cos desc, id).
    * Output: (q_id, c_id, rank, cos).
    */
  def topK(embeddings: DataFrame, planes: Int, k: Int, dim: Int = 64): DataFrame = {
    // Cache the bucketed projection: the signature is `planes` dot
    // products per vector and the self-join would otherwise evaluate it
    // once per side.
    val e = embeddings
      .select(col("vec_id"), col("embedding"),
        bucket(col("embedding"), planes, dim).as("bkt"))
      .cache()
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
    e.as("a").join(e.as("b"),
        col("a.bkt") === col("b.bkt") && col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("a.vec_id").as("q_id"), col("b.vec_id").as("c_id"),
        VecFns.cosine(col("a.embedding"), col("b.embedding")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("rank"), round(col("cos"), 4).as("cos"))
  }
}
