package graft

import graft.ops.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chain merges transitively, islands stay apart") {
    // A~B, B~C (no A~C edge) must collapse into one component; D~E is a
    // separate island — the exact under-merge a pairwise survivor
    // election gets wrong.
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val cc = Graph.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connected components: long path needs multiple propagation rounds") {
    // a 9-node path has diameter 8 — exercises the iteration loop, not
    // just the first round
    val edges = (0L until 8L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Graph.connectedComponents(edges).as[(Long, Long)].collect()
    assert(cc.length === 9)
    assert(cc.forall(_._2 === 0L))
  }

  test("connected components: edge direction does not matter") {
    val cc = Graph.connectedComponents(
        Seq((5L, 2L), (2L, 9L)).toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(cc === Map(2L -> 2L, 5L -> 2L, 9L -> 2L))
  }

  test("doc clusters on testdata: members pair with a lower-id doc in-cluster") {
    val clusters = Graph.docClusters(spark, sf)
      .as[(Long, Long)].collect()
    assert(clusters.nonEmpty)
    // every cluster id is the min member (canonical survivor election)
    val byCluster = clusters.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._1).min === cid)
      assert(members.length >= 2) // singletons are not emitted
    }
    // cluster census agrees with the per-doc view
    val sizes = Graph.clusterSizes(spark, sf)
      .as[(Long, Long, Long)].collect()
      .map { case (cid, n, _) => cid -> n }.toMap
    assert(sizes === byCluster.view.mapValues(_.length.toLong).toMap)
  }
}
