package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Bucket id column from a slice of hyperplanes: bit j set iff
    * dot(vec, plane_j) >= 0.
    */
  private def bucketOf(vd: Column, hp: Seq[Seq[Double]]): Column =
    hp.zipWithIndex.map { case (p, j) =>
      val planeLit = array(p.map(lit): _*)
      when(VecFns.dot(vd, planeLit) >= 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** DuckDB SQL expression computing the SAME bucket id as [[bucketOf]]
    * for a list column named `vec`: hyperplane components are embedded as
    * literal doubles (shortest-string repr round-trips to the identical
    * double), and each dot product sums in index order, matching
    * [[graft.functions.DotProduct]]'s left-to-right fold bit-for-bit — so
    * a SQL oracle can block on buckets exactly like the Spark side.
    */
  private def bucketSqlOf(vec: String, hp: Seq[Seq[Double]], dim: Int): String =
    hp.zipWithIndex.map { case (p, j) =>
      val planeLit = p.map(_.toString).mkString("[", ", ", "]")
      s"(CASE WHEN list_sum(list_transform(range(1, ${dim + 1}), " +
        s"i -> $vec[i]::DOUBLE * ($planeLit)[i])) >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Signature bucket id of `vec` (array<float|double>) under `planes`
    * fixed hyperplanes of dimension `dim`.
    */
  def bucket(vec: Column, planes: Int, dim: Int): Column =
    bucketOf(VecFns.asDouble(vec), hyperplanes(planes, dim))

  /** Planes-per-band sized to the corpus: candidate-pair cost within a
    * band is O(n² / 2^planes), so planes must GROW with n to keep the
    * expected bucket population (≈ n / 2^planes) near `targetBucket` —
    * a fixed plane count that behaves at 5k vectors is quadratic at 5B.
    * planes ≈ log2(n / targetBucket), clamped; recall lost to the extra
    * planes is bought back with more bands (1 - (1-p^k)^L), which scales
    * cost LINEARLY in L instead of quadratically in bucket population.
    */
  def autoPlanesPerBand(n: Long, targetBucket: Int = 64,
                        minPlanes: Int = 3, maxPlanes: Int = 24): Int = {
    val raw = math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt
    math.min(maxPlanes, math.max(minPlanes, raw))
  }

  /** Band-amplified signature keys — `bands` independent hash tables of
    * `planesPerBand` hyperplanes each, as an array<struct<band,bkt>> to
    * explode into per-table candidate keys. For pairs with per-plane
    * collision probability p = 1 - angle/pi, recall after L tables of k
    * planes is 1 - (1 - p^k)^L: k bounds bucket population (grow it with
    * corpus size), L buys recall back. One evaluation emits all bands.
    */
  def bandedBuckets(vec: Column, bands: Int, planesPerBand: Int, dim: Int): Column = {
    val hp = hyperplanes(bands * planesPerBand, dim)
    val vd = VecFns.asDouble(vec)
    val structs = (0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        bucketOf(vd, hp.slice(b * planesPerBand, (b + 1) * planesPerBand)).as("bkt"))
    }
    array(structs: _*)
  }

  /** Per-band DuckDB bucket expressions mirroring [[bandedBuckets]]
    * exactly (same plane slices, same literal doubles, same fold order).
    */
  def bandedBucketSql(vec: String, bands: Int, planesPerBand: Int, dim: Int): Seq[String] = {
    val hp = hyperplanes(bands * planesPerBand, dim)
    (0 until bands).map { b =>
      bucketSqlOf(vec, hp.slice(b * planesPerBand, (b + 1) * planesPerBand), dim)
    }
  }

  /** Deduped candidate pairs sharing a bucket in ANY of `bands` tables of
    * `planesPerBand` planes. `ordered = true` emits each pair once with
    * a < b (near-dup pair semantics); `false` emits both directions
    * (per-query neighbor semantics). The exploded bucket table is cached:
    * the self-join consumes it twice and the 18-dot-product signature is
    * the expensive part. Output columns: (a_id, b_id).
    */
  def bandedCandidates(embeddings: DataFrame, bands: Int, planesPerBand: Int,
                       dim: Int, ordered: Boolean): DataFrame = {
    val e = graft.CacheRegistry.track(embeddings
      .select(col("vec_id"),
        explode(bandedBuckets(col("embedding"), bands, planesPerBand, dim)).as("bk"))
      .select(col("vec_id"), col("bk.band").as("band"), col("bk.bkt").as("bkt"))
      .cache())
    val idPred =
      if (ordered) col("a.vec_id") < col("b.vec_id")
      else col("a.vec_id") =!= col("b.vec_id")
    e.as("a").join(e.as("b"),
        col("a.band") === col("b.band") && col("a.bkt") === col("b.bkt") && idPred)
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"))
      .distinct()
  }

  /** Multi-table ANN top-k: candidates share a bucket in ANY of `bands`
    * independent tables of `planesPerBand` planes, deduped, then scored
    * with exact cosine and ranked per query. This is the production ANN
    * shape: planesPerBand bounds bucket population (grow with corpus size
    * — planesPerBand ≈ log2(n / targetBucket)), bands buys recall back
    * (1-(1-p^k)^L), and the whole thing is equi-joins + one window — no
    * cross join anywhere. Output: (q_id, c_id, rank, cos).
    */
  def topKBanded(embeddings: DataFrame, bands: Int, planesPerBand: Int, k: Int,
                 dim: Int = 64): DataFrame = {
    val cand = bandedCandidates(embeddings, bands, planesPerBand, dim, ordered = false)
      .select(col("a_id").as("q_id"), col("b_id").as("c_id"))
    // Precompute each vector's norm ONCE and carry it to the pair phase:
    // cosine recomputed per pair would spend 3 dot products per candidate
    // (dot + both norms); with norms carried it's 1 dot + 1 divide —
    // 3x less vector math in the O(candidates) hot path. Same double
    // association (sqrt(na)*sqrt(nb)), so scores are bit-identical.
    val v = embeddings
      .select(col("vec_id"), VecFns.asDouble(col("embedding")).as("ve"))
      .withColumn("nrm", sqrt(VecFns.norm2(col("ve"))))
    val scored = cand
      .join(v.select(col("vec_id").as("q_id"), col("ve").as("qe"), col("nrm").as("qn")), "q_id")
      .join(v.select(col("vec_id").as("c_id"), col("ve").as("ce"), col("nrm").as("cn")), "c_id")
      .withColumn("cos", VecFns.dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
    // bounded-heap top-k (plans/TopKPerKey): no sort of the full
    // candidate set per query; the rank window sorts only the k kept
    graft.plans.TopKPerKey.withRank(scored, Seq(col("q_id")),
        Seq(col("cos").desc, col("c_id")), k, rankCol = "rank")
      .select(col("q_id"), col("c_id"), col("rank"), round(col("cos"), 4).as("cos"))
  }

  /** Single-table bucketed ANN top-k: join vectors within each LSH bucket,
    * score with exact cosine, keep the top `k` neighbors per query by
    * (cos desc, id). Kept as the simplest LSH shape (and the plane-sweep
    * baseline); [[topKBanded]] is the recall-bearing production variant.
    * Output: (q_id, c_id, rank, cos).
    */
  def topK(embeddings: DataFrame, planes: Int, k: Int, dim: Int = 64): DataFrame = {
    // Cache the bucketed projection: the signature is `planes` dot
    // products per vector and the self-join would otherwise evaluate it
    // once per side.
    val e = graft.CacheRegistry.track(embeddings
      .select(col("vec_id"), col("embedding"),
        bucket(col("embedding"), planes, dim).as("bkt"))
      .cache())
    // bounded-heap top-k per query (plans/TopKPerKey — identical output
    // to the row_number window by the q58 parity proof) instead of a
    // full sort of every probed bucket's candidate stream
    val cands = e.as("a").join(e.as("b"),
        col("a.bkt") === col("b.bkt") && col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("a.vec_id").as("q_id"), col("b.vec_id").as("c_id"),
        VecFns.cosine(col("a.embedding"), col("b.embedding")).as("cos"))
    graft.plans.TopKPerKey.withRank(cands, Seq(col("q_id")),
        Seq(col("cos").desc, col("c_id")), k, rankCol = "rank")
      .select(col("q_id"), col("c_id"), col("rank"), round(col("cos"), 4).as("cos"))
  }
}
