package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Graph primitives over the canonical edge-list model (SURVEY O1, J1, J2,
  * M8). The reference materializes a dense n×n adjacency matrix and
  * multiplies it (`/root/reference/AA-Smurf.py:103-110`); every one of those
  * matrix ops is a join/aggregation over the sparse edge list here — the
  * form that is linear in |E| and distributes.
  */
object GraphOps {

  /** Distinct node universe = union of both endpoints (`AA-AR.py:40,98`;
    * `AA-Smurf.py:38`). Sorted ascending to match numpy.unique's order
    * where positional semantics matter.
    */
  def nodes(edges: DataFrame): DataFrame =
    edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .distinct()

  /** Deduplicated directed edge set (the 0/1 adjacency): multi-edges
    * collapse to one, matching the binary matrix of `AA-Smurf.py:39-41`.
    */
  def binaryEdges(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst")).distinct()

  /** Per-node triangle counts over the UNDIRECTED simple graph of a
    * binary edge list — degree-oriented wedge join (the MapReduce-era
    * standard, Suri & Vassilvitskii 2011): orient every undirected edge
    * from its (degree, id)-smaller endpoint to the larger, so each
    * triangle is counted exactly once and — the scale property — wedge
    * fan-out is bounded: a hub of degree d only fans out over its
    * HIGHER-ordered neighbors, O(√m) of them, instead of all d (the
    * naive wedge join explodes quadratically on hubs; orientation is
    * the difference between 3·|Δ| and Σd² join rows).
    *
    * Output: (account, n_triangles) for every node in ≥1 triangle.
    * Everything is equi-joins + integer counts — oracle-exact.
    */
  def triangleCounts(bin: DataFrame): DataFrame = {
    val und = bin
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .transform(graft.util.Pins.pin(_))
    val deg = und.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    // oriented edge (u, w): from the (deg, id)-smaller endpoint; carry
    // the head's (deg, id) so wedge pairs order without a re-join
    val e = und
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da"),
        "a")
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db"),
        "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("w"), col("db").as("dw")))
          .otherwise(
            struct(col("b").as("u"), col("a").as("w"), col("da").as("dw")))
          .as("e"))
      .select(col("e.u"), col("e.w"), col("e.dw"))
      .transform(graft.util.Pins.pin(_))
    // wedges at u between (deg,id)-ordered heads, closed by an oriented
    // (w1, w2) edge
    val wedges = e.select(col("u"), col("w").as("w1"), col("dw").as("d1"))
      .join(e.select(col("u"), col("w").as("w2"), col("dw").as("d2")),
        "u")
      .filter(col("d1") < col("d2") ||
        (col("d1") === col("d2") && col("w1") < col("w2")))
    val tris = wedges.join(
      e.select(col("u").as("w1"), col("w").as("w2")), Seq("w1", "w2"))
      .select(col("u"), col("w1"), col("w2"))
    tris.select(explode(array(col("u"), col("w1"), col("w2")))
        .as("account"))
      .groupBy(col("account"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** 2-hop path counts: for every (i, j), the number of distinct m with
    * edges i→m and m→j. This IS the sparse boolean matmul A·A of
    * `AA-Smurf.py:105`, expressed as the canonical SQL matmul: equi
    * self-join on the middle vertex + count. Catalyst/AQE pick the join
    * strategy; hub-vertex skew is the known risk at scale (SURVEY §7.4) and
    * is handled by AQE skew-join splitting — the join key (mid) is a single
    * column so salting can be layered on later without changing semantics.
    *
    * `minCount` pushes the reference's `val >= 3` threshold
    * (`AA-Smurf.py:108`) into the aggregation (HAVING), so the candidate
    * set never materializes sub-threshold pairs.
    */
  def twoHopCounts(edges: DataFrame, minCount: Long = 3,
                   maxMidDegree: Option[Long] = None): DataFrame = {
    val (a1, a2) = twoHopSides(binaryEdges(edges), maxMidDegree)
    a1.join(a2, "m")
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** The two sides of the 2-hop self-join, optionally restricted to
    * middle vertices with in- AND out-degree ≤ `maxMidDegree`.
    *
    * The guard is the standard 2-hop/triangle-enumeration hub cap: one
    * mid with in/out degree 10⁶ alone emits 10¹² path rows through the
    * join — at 100 TB a single hub account (an exchange, a clearing
    * house) would dwarf the rest of the job. Degrees come from one
    * aggregation of the edge set; the filter is a semi-join, so the edge
    * table itself never re-shuffles. Capped-out hubs are EXCLUDED, not
    * split: smurf semantics look for many *moderate* intermediaries, and a
    * hub that intermediates everything carries no signal for them (handle
    * hubs in a dedicated dense pass if a workload needs them).
    */
  private def twoHopSides(b: DataFrame, maxMidDegree: Option[Long])
      : (DataFrame, DataFrame) = {
    val a1 = b.select(col("src").as("i"), col("dst").as("m"))
    val a2 = b.select(col("src").as("m"), col("dst").as("j"))
    maxMidDegree match {
      case None => (a1, a2)
      case Some(cap) =>
        // inner join: a node missing either side has no 2-hop path anyway
        val ok = b.groupBy(col("dst").as("m")).agg(count(lit(1)).as("ind"))
          .join(b.groupBy(col("src").as("m")).agg(count(lit(1)).as("outd")),
            "m")
          .filter(col("ind") <= cap && col("outd") <= cap)
          .select(col("m"))
        (a1.join(ok, Seq("m"), "left_semi"),
         a2.join(ok, Seq("m"), "left_semi"))
    }
  }

  /** Intermediary extraction (SURVEY J2, `AA-Smurf.py:109`): for each
    * above-threshold pair (i, j), the sorted set of middle vertices.
    * Sorting makes the array deterministic under any partitioning
    * (collect_set order is not).
    */
  def twoHopMids(edges: DataFrame, minCount: Long = 3,
                 maxMidDegree: Option[Long] = None): DataFrame = {
    val (a1, a2) = twoHopSides(binaryEdges(edges), maxMidDegree)
    a1.join(a2, "m")
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("cnt"),
           array_sort(collect_set(col("m"))).as("mids"))
      .filter(col("cnt") >= minCount)
  }

  /** Symmetric permutation (SURVEY M8, `AA-Smurf.py:59,165`): relabel both
    * endpoints by a position table `positions(id, pos)`. The output is the
    * position-labeled edge list — the dense reordered picture is
    * presentation, not data. When `positions` covers only the candidate
    * subgraph actually reordered (the MDL path) it is small → keep the
    * default broadcast hint, no shuffle of the edge table. When it is the
    * FULL node universe (q51/q52's identity/degree orders) pass
    * `broadcastPositions = false`: a 10⁹-node position table must arrive
    * via a shuffle join, and AQE still auto-broadcasts it when it turns
    * out small at runtime.
    */
  def permuteEdges(edges: DataFrame, positions: DataFrame,
                   broadcastPositions: Boolean = true): DataFrame = {
    val p = if (broadcastPositions) broadcast(positions) else positions
    edges
      .join(p.withColumnRenamed("id", "src").withColumnRenamed("pos", "src_pos"), "src")
      .join(p.withColumnRenamed("id", "dst").withColumnRenamed("pos", "dst_pos"), "dst")
      .select(col("src"), col("dst"), col("src_pos"), col("dst_pos"))
  }

  /** Dense 0-based rank of every row under `order` — the distributed
    * replacement for `row_number().over(Window.orderBy(...))`, which moves
    * the whole table through ONE task (Spark itself warns "No Partition
    * Defined for Window operation"). Here the table is range-partitioned
    * and sorted on `order` (a real distributed sort), then indexed by the
    * two-pass idiom: one cheap job counts rows per sorted partition, the
    * second adds the partition's cumulative offset to the row's
    * partition-local index. Wherever the range boundaries land, the
    * global index equals the rank — provided `order` is a TOTAL order
    * (include a unique tiebreak column), which is also what makes the
    * rank well-defined in the first place.
    *
    * Round 15: the index rides `monotonically_increasing_id()` — whose
    * documented layout IS (partitionId << 33) | partition-local row
    * index — instead of `rdd.zipWithIndex`, which dropped the whole
    * table out of Tungsten into external Row objects and back (two full
    * serialization passes, no codegen downstream; guide §4). The sorted
    * table is localCheckpoint-ed: the count pass and the consumer share
    * one InternalRow materialization, AND the result stays a LEAF plan
    * (LogicalRDD) exactly like the zipWithIndex original — keeping the
    * full lineage here turned chained rank-over-rank pipelines into
    * exponentially-printed plan trees (diamond reuse is printed as a
    * tree, not a DAG), and every action pays the plan-description
    * string for its listener event: the curate CLI sat minutes inside
    * TreeNode.generateTreeString on the driver. Offsets come back as
    * one tiny driver map and rejoin as a literal-map lookup,
    * whole-stage-codegen friendly.
    */
  def withPosition(df: DataFrame, posCol: String,
                   order: Column*): DataFrame =
    withPositionCounted(df, posCol, order: _*)._1

  /** [[withPosition]] plus the table's EXACT row count, which the
    * offsets pass computes anyway — a consumer that needs n (e.g. the
    * bucket split `⌊pos·nFiles/n⌋`) takes it from here instead of
    * re-aggregating max(pos)+1 over the ranked table (one fewer job and
    * no broadcast-join of the count row; identical value: positions are
    * dense 0..n−1).
    */
  def withPositionCounted(df: DataFrame, posCol: String,
                          order: Column*): (DataFrame, Long) = {
    val localMask = (1L << 33) - 1
    // LAZY checkpoint (round 16): the offsets count below is always the
    // first action over the sorted table, so it materializes the
    // checkpoint as a side effect — eager = true paid a separate
    // materialization job per rank call for nothing (the driver's r15
    // data showed the fixed cost dominating the small rank consumers
    // q70/q78). Still a localCheckpoint: the plan stays a LEAF (the
    // chained-rank plan-string blowup fix) and the data stays
    // InternalRow-backed. Durability trade, documented: local checkpoint
    // blocks are NOT reliable storage — on a cluster, losing an executor
    // after materialization fails the job instead of recomputing
    // (acceptable for these short-lived rank pipelines; swap in
    // `checkpoint()` against a reliable dir if a deployment needs
    // recompute-on-loss).
    val sorted = df.repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint(eager = false)
    val counts = sorted
      .groupBy(shiftright(col("__mid"), 33).as("__pid"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, n) =>
      val o = acc; acc += n; pid -> o
    }.toMap // pid -> global rank of its first row
    val offExpr =
      if (offsets.isEmpty) lit(0L)
      else element_at(
        map(offsets.toSeq.sortBy(_._1)
          .flatMap { case (p, o) => Seq(lit(p), lit(o)) }: _*),
        shiftright(col("__mid"), 33))
    (sorted.withColumn(posCol,
      offExpr + (col("__mid") bitwiseAND lit(localMask)))
      .drop("__mid"), acc)
  }
}
