package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.HashFns

/** Word-3-gram Jaccard near-duplicate pairs with hot-shingle bounding —
  * the exact n-gram dedup path of the LLM-data surface (query
  * `d02_ngram_jaccard`).
  *
  * Scale design: candidate generation is an equi-join on the shingle key,
  * so its cost is O(Σ_k df(k)²) over shingle document frequencies. One
  * boilerplate 3-gram shared by millions of docs ("all rights reserved")
  * makes that quadratic at 100 TB. The standard fix is stop-shingle
  * filtering: drop shingle keys with df > maxDf BEFORE sizing and pairing,
  * bounding per-key join fan-out at maxDf² while barely moving Jaccard for
  * real near-dups (a df-capped shingle carries almost no discriminating
  * signal). The df pass is a window count over the same `sk` key the pair
  * join shuffles on.
  */
object NgramJaccard {

  /** Exploded (doc_id, sk) shingle keys — 16-hex-char md5 prefixes of the
    * word 3-grams (fixed-width keys shuffle/compare cheaper than raw
    * shingle text) — with keys of document frequency > maxDf dropped.
    *
    * The hot-key set is found with a map-side-combining aggregate and
    * broadcast into an anti-join: by construction it holds at most
    * n_shingles/maxDf keys (tiny — stop-shingles are rare by definition),
    * so this never sorts or windows the full shingle stream the way a
    * count-over-partition formulation would.
    */
  def cappedShingleKeys(documents: DataFrame, maxDf: Int): DataFrame =
    cappedFrom(shingleKeys(documents), maxDf)

  /** Raw exploded (doc_id, sk) keys, no cap. */
  def shingleKeys(documents: DataFrame): DataFrame =
    HashFns.explodedShingles(documents)
      .select(col("doc_id"), substring(md5(col("s").cast("binary")), 1, 16).as("sk"))

  private def cappedFrom(sh: DataFrame, maxDf: Int): DataFrame = {
    val hot = sh.groupBy("sk").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select("sk")
    sh.join(broadcast(hot), Seq("sk"), "left_anti")
  }

  /** Candidate pairs sharing at least one (capped) shingle key, with the
    * shared-key count. Equi-join on sk — never all-pairs.
    */
  def candidatePairs(shingleKeys: DataFrame): DataFrame =
    shingleKeys.as("a").join(shingleKeys.as("b"),
        col("a.sk") === col("b.sk") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))

  /** Near-dup pairs with Jaccard >= minJaccard over the df-capped shingle
    * sets. Output: (doc_a, doc_b, common, sz_a, sz_b, jaccard — raw
    * double, caller rounds for parity).
    */
  def pairs(documents: DataFrame, minJaccard: Double, maxDf: Int): DataFrame = {
    // Cache the RAW shingle stream, not the capped one: the hot-key
    // aggregate, the anti-join probe side, the sizes aggregate, and both
    // sides of the pair join all re-derive from it, and the explode+md5
    // upstream is the expensive part — one cache serves all four consumers
    // (the anti-join re-filter over cached rows is cheap by comparison).
    val sh = cappedFrom(graft.CacheRegistry.track(shingleKeys(documents).cache()), maxDf)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    candidatePairs(sh)
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("jaccard", col("common") / (col("sz_a") + col("sz_b") - col("common")))
      .filter(col("jaccard") >= minJaccard)
  }
}
