package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecFns

/** IVF-style approximate-nearest-neighbor search (inverted-file index):
  * the second scale path next to [[LshAnn]].
  *
  * Structure of a production IVF: a small coarse quantizer (nlist
  * centroids) partitions the corpus into inverted lists; a query probes
  * only its `nprobe` closest lists. Here the quantizer is a deterministic
  * sample of the corpus (first `nlist` vectors by id — a stand-in for
  * k-means training, which would be an offline job at 100 TB), broadcast
  * to assign every vector via `nlist` cosine comparisons; search is then
  * an equi-join on the centroid id — candidate count shrinks by
  * ~nprobe/nlist versus brute force, with recall < 1 by construction
  * (rows-only check, like LSH ANN).
  */
object IvfAnn {

  /** Assign each vector to its nearest centroid id. */
  def assign(embeddings: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("__sim").desc, col("cent_id"))
    embeddings
      .crossJoin(broadcast(centroids))
      .withColumn("__sim", VecFns.cosine(col("embedding"), col("ce")))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id"))
  }

  /** Probe assignment: each query's `nprobe` nearest centroid ids. */
  def probes(queries: DataFrame, centroids: DataFrame, nprobe: Int): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("__sim").desc, col("cent_id"))
    queries
      .crossJoin(broadcast(centroids))
      .withColumn("__sim", VecFns.cosine(col("qe"), col("ce")))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= nprobe)
      .select(col("q_id"), col("qe"), col("cent_id"))
  }

  /** SemDeDup-style embedding dedup (Abbas et al. 2023 pattern): block
    * the corpus by inverted list (nearest centroid), then within each
    * list flag every vector that has a LOWER-id neighbor with cosine ≥
    * `tau` — the greedy keep-lowest-id canonicalization, decided by one
    * self-equi-join on the list id. Cost is O(Σ list_size²), bounded by
    * the quantizer: nlist grows with the corpus so list size stays
    * ~n/nlist (at 100 TB the centroids come from an offline k-means
    * job, exactly like [[topK]]'s quantizer stand-in).
    *
    * Versus d06's banded-LSH blocking: LSH bounds candidates
    * probabilistically per signature band; inverted-list blocking bounds
    * them geometrically per Voronoi cell — the variant every
    * embedding-curation pipeline ships, because the same cluster
    * assignment is reused for diversity sampling.
    *
    * Output: (vec_id, cent_id, is_dup) for EVERY vector — the curation
    * verdict, not just the pairs.
    */
  def semDedup(embeddings: DataFrame, nlist: Int, tau: Double): DataFrame = {
    val centroids = embeddings
      .filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
    val nrm = (v: org.apache.spark.sql.Column) => sqrt(VecFns.norm2(VecFns.asDouble(v)))
    val lists = graft.CacheRegistry.track(
      assign(embeddings, centroids)
        .withColumn("nrm", nrm(col("embedding")))
        .cache())
    val dups = lists.as("a")
      .join(lists.as("b"),
        col("a.cent_id") === col("b.cent_id") && col("a.vec_id") < col("b.vec_id"))
      .filter(
        VecFns.dot(VecFns.asDouble(col("a.embedding")), VecFns.asDouble(col("b.embedding"))) /
          (col("a.nrm") * col("b.nrm")) >= tau)
      .select(col("b.vec_id").as("vec_id")).distinct()
    lists.select(col("vec_id"), col("cent_id"))
      .join(dups.withColumn("__d", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cent_id"),
        coalesce(col("__d"), lit(false)).as("is_dup"))
  }

  /** IVF ANN top-k: queries = vectors with vec_id < nQueries (mirroring
    * the brute-force d05 query set). Output (q_id, c_id, rank, cos).
    *
    * The list-search phase (the O(candidates) hot path) carries
    * precomputed norms, so scoring is 1 dot + 1 divide per candidate
    * instead of cosine's 3 dots; the quantizer phases keep plain cosine
    * (only nlist comparisons per vector). Same double association, so
    * scores are bit-identical to the cosine formulation.
    */
  def topK(embeddings: DataFrame, nQueries: Int, k: Int,
           nlist: Int, nprobe: Int): DataFrame = {
    val centroids = embeddings
      .filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
    val nrm = (v: org.apache.spark.sql.Column) => sqrt(VecFns.norm2(VecFns.asDouble(v)))
    val lists = assign(embeddings, centroids)
      .withColumn("c_nrm", nrm(col("embedding")))
    val qs = probes(
      embeddings.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe")),
      centroids, nprobe)
      .withColumn("q_nrm", nrm(col("qe")))
    val scored = qs
      .join(lists, Seq("cent_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("c_id"),
        (VecFns.dot(VecFns.asDouble(col("qe")), VecFns.asDouble(col("embedding"))) /
          (col("q_nrm") * col("c_nrm"))).as("cos"))
    // bounded-heap top-k (plans/TopKPerKey): no sort of the probed lists
    graft.plans.TopKPerKey.withRank(scored, Seq(col("q_id")),
        Seq(col("cos").desc, col("c_id")), k, rankCol = "rank")
      .select(col("q_id"), col("c_id"), col("rank"), round(col("cos"), 4).as("cos"))
  }
}
