package graft.ops

import org.apache.spark.graphx.{Edge => GxEdge, Graph}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GraphX bridge: the vertex-program formulations of the engine's graph
  * analytics, for workloads where Pregel iteration beats relational joins
  * (many rounds over a static graph — the partitioned adjacency is built
  * once and reused, where the DataFrame loop re-shuffles per round).
  *
  * The edge DataFrame stays the canonical model (SURVEY §1.1); these
  * convert at the boundary. Label conventions match the DataFrame
  * implementations (GraphX connectedComponents labels components by min
  * vertex id, exactly like Dedup.connectedComponents), so the two paths
  * are interchangeable and cross-checked in specs.
  */
object GraphXOps {

  /** Static PageRank over the binary edge graph: account "importance"
    * for triage/attention ranking. `iters` fixed iterations, damping
    * 1 − resetProb.
    */
  def pageRank(binaryEdges: DataFrame, iters: Int = 10,
               resetProb: Double = 0.15): DataFrame = {
    val spark = binaryEdges.sparkSession
    import spark.implicits._
    val edges = binaryEdges.select(col("src"), col("dst"))
      .as[(Long, Long)].rdd
      .map { case (s, d) => GxEdge(s, d, 1.0) }
    Graph.fromEdges(edges, 0.0)
      .staticPageRank(iters, resetProb)
      .vertices
      .toDF("account", "rank")
  }

  /** Connected components via GraphX Pregel — the alternative to
    * Dedup.connectedComponents' join loop; labels = min vertex id.
    */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.select(col("doc_a"), col("doc_b"))
      .as[(Long, Long)].rdd
      .map { case (a, b) => GxEdge(a, b, 1) }
    Graph.fromEdges(edges, 0)
      .connectedComponents()
      .vertices
      .toDF("doc_id", "cluster_id")
  }
}
