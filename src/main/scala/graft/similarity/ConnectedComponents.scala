package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the cluster
  * canonicalization step every production dedup pipeline runs after
  * candidate pairing (pick one representative per duplicate cluster, drop
  * the rest). Pairs only say "a ~ b"; transitive closure turns them into
  * clusters: {a~b, b~c} => {a,b,c} share one cluster id.
  *
  * Algorithm: min-label propagation WITH pointer jumping, restricted to
  * graph nodes — each round every node takes min(own label, neighbors'
  * labels, label of its own label). The neighbor step moves a minimum one
  * hop; the label-of-label step halves pointer chains (path compression),
  * so convergence is O(log n) rounds even on an adversarial path graph,
  * the same asymptotics as the alternating large-star/small-star method.
  * Each round is two equi-joins + a hash aggregate (fully distributed, no
  * driver-side graph), the working set is only the docs that appear in a
  * pair (≪ corpus at scale — near-dup graphs are sparse), and
  * `localCheckpoint` truncates the plan lineage each round so the loop
  * doesn't accumulate a deep DAG.
  */
object ConnectedComponents {

  /** Cluster assignment for every document: (doc_id, cluster_id,
    * cluster_size), where cluster_id = min doc_id reachable through
    * `pairs` (columns doc_a, doc_b) and docs in no pair are singleton
    * clusters of themselves.
    */
  def dupClusters(documents: DataFrame, pairs: DataFrame, maxIters: Int = 25): DataFrame = {
    val edges = graft.CacheRegistry.track(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .persist())
    val nodes = graft.CacheRegistry.track(
      edges.select(col("src").as("doc_id")).distinct().persist())

    // `cp` is the CHECKPOINTED frame each round (its analyzed plan is the
    // bare LogicalRDD Shim.checkpointedRdd can unpersist/track); `labels`
    // is the (doc_id, cluster_id) view of it the joins consume
    var cp = nodes.withColumn("cluster_id", col("doc_id")).localCheckpoint(true)
    var labels = cp
    // the checkpointed internal RDD of the PREVIOUS round, freed once the
    // round's change-count (the last consumer) has run — bounds pinned
    // storage at two label tables instead of one per round
    var prevRdd: Option[org.apache.spark.rdd.RDD[_]] = None
    var iter = 0
    var done = false
    while (!done && iter < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("dst"), col("cluster_id").as("dst_cl")), "dst")
        .groupBy(col("src").as("doc_id"))
        .agg(min("dst_cl").as("nbr_cl"))
      // pointer jumping: the label of my label (labels is keyed by doc_id
      // and every label IS a node id, so this is a self-join)
      val jump = labels.select(col("doc_id").as("cluster_id"), col("cluster_id").as("jump_cl"))
      // ONE job per round: the new label rides next to the old one into a
      // LAZY local checkpoint, and the change-count action both
      // materializes the checkpoint and counts strict decreases from the
      // cached rows — no second pass, no join-against-previous (the
      // previous round's shape ran an EAGER checkpoint job plus a
      // full-shuffle next⋈labels count job per round, doubling the loop's
      // fixed job/planning overhead for the same answer)
      val next = labels
        .withColumnRenamed("cluster_id", "old_cl")
        .join(nbrMin, Seq("doc_id"), "left")
        .join(jump.withColumnRenamed("cluster_id", "old_cl"), Seq("old_cl"), "left")
        .select(col("doc_id"),
          least(col("old_cl"),
            coalesce(col("nbr_cl"), col("old_cl")),
            coalesce(col("jump_cl"), col("old_cl")))
            .as("cluster_id"),
          col("old_cl"))
        .localCheckpoint(false)
      val changes = next.filter(col("cluster_id") < col("old_cl")).count()
      prevRdd.foreach(_.unpersist(false))
      prevRdd = org.apache.spark.sql.graftshim.Shim.checkpointedRdd(cp)
      cp = next
      labels = next.select("doc_id", "cluster_id")
      done = changes == 0L
      iter += 1
    }
    // the loop exits with two checkpointed label RDDs still persisted:
    // the round-before-last (safe to free now) and the final `labels`
    // (referenced by the returned plan — the CALLER releases it via
    // CacheRegistry once the result has been consumed)
    prevRdd.foreach(_.unpersist(false))
    org.apache.spark.sql.graftshim.Shim.checkpointedRdd(cp)
      .foreach(graft.CacheRegistry.trackRdd(_, labels.sparkSession))
    // Non-convergence means the returned cluster ids would be WRONG (a
    // component wider than the rounds could traverse). Silent wrong
    // answers are unacceptable in an oracle-checked pipeline, so fail
    // loudly — with pointer jumping the fixpoint needs only O(log n)
    // rounds, so tripping this on legitimate input means maxIters was set
    // far too low for the corpus, not an algorithmic dead end.
    if (!done)
      throw new IllegalStateException(
        s"ConnectedComponents: no fixpoint after $maxIters rounds — " +
          s"component diameter exceeds 2^$maxIters; raise maxIters")

    // Cluster ids in `labels` are always NODE ids (min-label over node
    // ids), and a singleton's cluster id is its own non-node doc id —
    // the two id sets are DISJOINT, so the previous union-then-self-join
    // (which computed the union twice and shuffled the singletons
    // through a join that could only ever match themselves) decomposes
    // into: size the labeled clusters alone, and stamp every singleton
    // with its literal size of 1. Identical output, one union branch
    // instead of two and no singleton shuffle.
    val singles = documents.select("doc_id")
      .join(nodes, Seq("doc_id"), "left_anti")
      .withColumn("cluster_id", col("doc_id"))
    val sizes = labels.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "cluster_id").select("doc_id", "cluster_id", "cluster_size")
      .unionByName(singles.withColumn("cluster_size", lit(1L))
        .select("doc_id", "cluster_id", "cluster_size"))
  }
}
