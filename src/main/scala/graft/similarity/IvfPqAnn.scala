package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF + PQ composed — the production Faiss `IVFPQ` shape (Jégou et al.
  * 2011), built entirely from the two standalone stages this library
  * already ships: [[IvfAnn]]'s trained coarse quantizer routes vectors
  * into inverted lists and winnows each query to `nprobe` lists
  * (candidate COUNT ↓ by ~nprobe/nlist), [[PqAnn]]'s codebooks shrink
  * each candidate to `m` one-byte codes scored by lookup-table
  * additions (candidate REPRESENTATION ↓ 16–64×), and an exact
  * re-rank of the short ADC shortlist restores recall. The two
  * reductions multiply: at 100 TB a query touches `nprobe/nlist` of a
  * codes table that is itself a fraction of the raw corpus — the
  * reason this exact composition is the default at billion-vector
  * scale — and the one scan whose cost grows with the corpus (the
  * candidate code scan) is an equi-join that co-locates by storing
  * codes clustered by list id, exactly how a real deployment lays the
  * index out.
  *
  * Codebooks quantize raw vectors, not per-list residuals (the classic
  * IVFADC refinement): residual codebooks buy precision when lists are
  * many and tight; with the corpus-level codebooks already recall-
  * measured in PqAnnSpec, the simpler composition keeps every stage
  * individually testable and the exact re-rank recovers the gap.
  */
object IvfPqAnn {

  /** Top-k for the `nQueries` lowest-id vectors (mirroring d05/d08's
    * query-set convention). Output: (q_id, c_id, rank, cos) — `cos`
    * exact via the final re-rank. `corpusTag` keys the trained
    * quantizer/codebook memos (the offline-job pattern both stages
    * document).
    */
  def topK(embeddings: DataFrame, corpusTag: String, nQueries: Int, k: Int,
           nlist: Int, nprobe: Int, dim: Int, m: Int, ksub: Int,
           refine: Int = 8): DataFrame = {
    val cents = IvfAnn.trainedCentroidsFor(embeddings, corpusTag, nlist)
    val lists = IvfAnn.assign(embeddings, cents).select("vec_id", "cent_id")
    val cb = PqAnn.codebooksFor(embeddings, corpusTag, dim, m, ksub)
    val codes = PqAnn.encode(embeddings, cb, dim, m)
    val queries = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val probed = IvfAnn.probes(queries, cents, nprobe).select("q_id", "cent_id")
    // candidates = the probed lists' members only (self excluded) —
    // the IVF winnowing; broadcast the nq × nprobe probe pairs into
    // the list scan
    val candidates = lists.join(broadcast(probed), Seq("cent_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id")
    val shortlist = PqAnn
      .searchCandidates(queries, cb, codes, candidates, dim, m, k * refine)
      .select(col("q_id"), col("c_id"))
    PqAnn.rerank(queries, embeddings, shortlist, k)
  }
}
