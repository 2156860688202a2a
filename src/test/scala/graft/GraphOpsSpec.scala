package graft

import graft.ops.GraphOps

/** J1/J2/P7 2-hop mining against hand-computed paths (`AA-Smurf.py:102-110`
  * semantics: binary adjacency, count of distinct intermediaries).
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  // smurf block: 1 → {10,11,12} → 2, plus noise 1→2 direct, multi-edges
  private lazy val edges = Seq(
    (1L, 10L, 1L, 0L), (1L, 10L, 2L, 1L), // multi-edge collapses
    (1L, 11L, 1L, 0L), (1L, 12L, 1L, 0L),
    (10L, 2L, 1L, 0L), (11L, 2L, 1L, 0L), (12L, 2L, 1L, 0L),
    (1L, 2L, 1L, 0L), (2L, 3L, 1L, 0L)
  ).toDF("src", "dst", "weight", "ts")

  test("binaryEdges collapses multi-edges") {
    assert(GraphOps.binaryEdges(edges).count() == 8)
  }

  test("nodes = union of endpoints") {
    val n = GraphOps.nodes(edges).as[Long].collect().toSet
    assert(n == Set(1L, 2L, 3L, 10L, 11L, 12L))
  }

  test("twoHopCounts finds the smurf pair at threshold 3") {
    val got = GraphOps.twoHopCounts(edges, 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 3L)))
  }

  test("twoHopCounts threshold 1 includes all 2-paths") {
    val got = GraphOps.twoHopCounts(edges, 1)
      .select($"i", $"j").as[(Long, Long)].collect().toSet
    // 1→10→2, 1→11→2, 1→12→2 (pair (1,2) cnt 3); 1→2→3; 10→2→3; 11→2→3;
    // 12→2→3
    assert(got == Set((1L, 2L), (1L, 3L), (10L, 3L), (11L, 3L), (12L, 3L)))
  }

  test("twoHopMids returns the sorted intermediary set") {
    val got = GraphOps.twoHopMids(edges, 3).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("i") == 1L && r.getAs[Long]("j") == 2L)
    assert(r.getSeq[Long](3) == Seq(10L, 11L, 12L))
  }

  test("triangleCounts: K4 plus a pendant, by hand") {
    // K4 on {1,2,3,4} has C(4,3)=4 triangles, every vertex in exactly 3;
    // pendant 5-1 joins none. Directions/duplicates must not matter.
    val es = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 1L), (2L, 1L), (3L, 3L)).toDF("src", "dst")
    val got = GraphOps.triangleCounts(es).collect()
      .map(r => r.getAs[Long]("account") -> r.getAs[Long]("n_triangles"))
      .toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts orientation: hub wedges bound by higher-ordered " +
      "neighbors") {
    // star K1,5 (hub 9): no triangles at all — the oriented wedge join
    // must emit nothing (a naive join on the hub would form C(5,2)
    // wedges; orientation points every edge INTO the hub, zero out)
    val es = (1L to 5L).map(i => (i, 9L)).toDF("src", "dst")
    assert(GraphOps.triangleCounts(es).count() == 0)
  }

  test("permuteEdges labels both endpoints with positions") {
    val pos = Seq((1L, 0L), (2L, 1L), (3L, 2L), (10L, 3L), (11L, 4L),
      (12L, 5L)).toDF("id", "pos")
    val p = GraphOps.permuteEdges(GraphOps.binaryEdges(edges), pos)
    assert(p.count() == 8)
    val r = p.filter($"src" === 1L && $"dst" === 10L).collect().head
    assert(r.getAs[Long]("src_pos") == 0L && r.getAs[Long]("dst_pos") == 3L)
  }
}
