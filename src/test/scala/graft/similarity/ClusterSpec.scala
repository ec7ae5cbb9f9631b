package graft.similarity

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.queries.LlmData

/** Connected-components (dup-cluster canonicalization) specs: synthetic
  * graphs with known closures, plus consistency with the live d03 pairs.
  */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(ids: Long*) =
    ids.map(i => (i, s"doc $i")).toDF("doc_id", "text")

  test("chain, triangle, and singleton resolve to the right clusters") {
    // components: {1,2,3,4} (a chain), {10,11,12} (a triangle), {99} alone
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L)
    ).toDF("doc_a", "doc_b")
    val out = ConnectedComponents
      .dupClusters(docsOf(1L, 2L, 3L, 4L, 10L, 11L, 12L, 99L), pairs)
      .select("doc_id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 1L, 4L), (2L, 1L, 4L), (3L, 1L, 4L), (4L, 1L, 4L),
      (10L, 10L, 3L), (11L, 10L, 3L), (12L, 10L, 3L),
      (99L, 99L, 1L)))
  }

  test("long chain converges past a single propagation round") {
    // a 100-node path would need 99 rounds of plain one-hop propagation;
    // pointer jumping must close it within the 25-round budget (O(log n))
    val n = 100
    val pairs = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))
      .toDF("doc_a", "doc_b")
    val out = ConnectedComponents
      .dupClusters(docsOf((0 until n).map(_.toLong): _*), pairs)
      .select("cluster_id").distinct().as[Long].collect().toSeq
    assert(out == Seq(0L))
  }

  test("every d03 pair lands in one cluster and sizes partition the corpus") {
    val clusters = LlmData.defs("d11_dup_clusters")(spark, sfDir)
    val byDoc = clusters.select("doc_id", "cluster_id")
      .as[(Long, Long)].collect().toMap
    val pairs = LlmData.defs("d03_minhash")(spark, sfDir)
      .as[(Long, Long)].collect()
    pairs.foreach { case (a, b) =>
      assert(byDoc(a) == byDoc(b), s"pair ($a,$b) split across clusters")
    }
    // cluster ids are the min member, and sizes sum to the corpus
    assert(byDoc.groupBy(_._2).forall { case (cid, m) => m.keys.min == cid })
    val n = Tables.documents(spark, sfDir).count()
    assert(clusters.count() == n)
  }
}
