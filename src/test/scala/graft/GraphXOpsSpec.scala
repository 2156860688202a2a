package graft

import org.apache.spark.sql.functions._

import graft.ops.GraphXOps

/** GraphX bridge: PageRank sanity + cross-check of the two
  * connected-components implementations (Pregel vs join-loop/union-find).
  */
class GraphXOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: fan-in hub outranks its spokes; ranks are positive") {
    // star: 1..6 all point at 100 (plus a back-edge so 100 isn't a sink)
    val edges = ((1L to 6L).map(i => (i, 100L)) :+ (100L, 1L))
      .toDF("src", "dst")
    val pr = GraphXOps.pageRank(edges).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.values.forall(_ > 0.0))
    assert(pr(100L) > pr(2L) * 3, s"hub ${pr(100L)} vs spoke ${pr(2L)}")
  }

  test("GraphX connected components agree with the DataFrame/union-find path") {
    val rng = new scala.util.Random(11)
    val pairs = Seq.fill(60)((rng.nextInt(40).toLong, rng.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
      .toDF("doc_a", "doc_b")
    val viaGraphX = GraphXOps.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val viaUnionFind = graft.ext.Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val viaJoins = graft.ext.Dedup.distributedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(viaGraphX == viaUnionFind)
    assert(viaGraphX == viaJoins)
  }
}
