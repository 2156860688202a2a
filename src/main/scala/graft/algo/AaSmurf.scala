package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.parallel.CollectionConverters._

/** AA-Smurf: MDL-guided reordering that isolates fan-out/fan-in "smurf"
  * blocks (reference `/root/reference/AA-Smurf.py:86-181`, SURVEY §3.2).
  *
  * Two phases with very different scale profiles:
  *
  *   1. CANDIDATE MINING — distributed. 2-hop pairs with ≥ c intermediaries
  *      (`AA-Smurf.py:102-110`) = the sparse boolean matmul, expressed as a
  *      self-join + count (GraphOps.twoHopMids). This is the part that
  *      touches |E| and must scale; it shuffles once on the middle vertex
  *      and once on the (i, j) pair.
  *
  *   2. GREEDY MDL REORDERING — an iterative program *over* the candidate
  *      subgraph (`AA-Smurf.py:116-158`). Each iteration tentatively
  *      appends one candidate block and scores the full reordered matrix's
  *      description length. The matrix that matters is induced by candidate
  *      endpoints + intermediaries — by construction a tiny, heavily
  *      connected core (the reference's own eval graphs are ≤ a few
  *      thousand nodes). We collect that induced subgraph once and run the
  *      loop on bitset adjacency with all driver cores scoring candidates
  *      in parallel (the joblib n_jobs=4 of `AA-Smurf.py:138` becomes a
  *      parallel collection over 32 threads). At 100 TB, mining stays in
  *      Spark; reordering a dense-block core is inherently a
  *      small-data/driver algorithm, like the final step of MLlib's
  *      iterative algorithms.
  *
  * Faithful quirks preserved (SURVEY §7.4): MDL's D-block encodes ZEROS and
  * excludes the last row/col (`AA-Smurf.py:74-75`); block slices `s+1:e`,
  * `s:e-1` etc. are half-open exactly as numpy; model selection returns the
  * iteration *before* the first within 10% of the final MDL
  * (`AA-Smurf.py:162`), where index −1 wraps to the last iteration.
  */
object AaSmurf {

  /** Universal code length for a positive real (`AA-Smurf.py:16-26`). */
  def logStar(x: Double): Double = 2.0 * (math.log(x) / math.log(2.0)) + 1.0

  private def log2(x: Double): Double = math.log(x) / math.log(2.0)

  /** Local adjacency on contiguous ids 0..n-1, rows as raw 64-bit words.
    *
    * The greedy scores every candidate against the CURRENT order each
    * iteration, and each score's dominant term is the D-block count over
    * the ~n unordered rows × cols — naively O(n²) bit probes per
    * candidate. Wide blocks instead AND a column mask against each row's
    * words and popcount: O(cols + rows·n/64), a ~50× constant-factor cut
    * at n≈300 that grows with n — this is what keeps the driver-side
    * reordering viable on the multi-thousand-node candidate cores the
    * distributed mining can hand over at full scale.
    */
  final class Adj(val n: Int) {
    private val words = (n + 63) >>> 6
    private val rows: Array[Array[Long]] = Array.ofDim[Long](n, words)
    def add(i: Int, j: Int): Unit =
      rows(i)(j >>> 6) |= (1L << (j & 63))
    def has(i: Int, j: Int): Boolean =
      ((rows(i)(j >>> 6) >>> (j & 63)) & 1L) != 0L
    /** # of set bits in row i (full matrix row). */
    def rowOnes(i: Int): Long = {
      val r = rows(i)
      var w = 0
      var c = 0L
      while (w < words) { c += java.lang.Long.bitCount(r(w)); w += 1 }
      c
    }
    /** # of 1-cells in rows [r0, r1) × cols [c0, c1) of the REORDERED
      * matrix (ranges are positions in `order`). */
    def countBlock(order: Array[Int], r0: Int, r1: Int, c0: Int,
                   c1: Int): Long = {
      var cnt = 0L
      if ((c1 - c0) >= 64) {
        // wide block: mask-and-popcount per row
        val mask = new Array[Long](words)
        var j = c0
        while (j < c1) {
          val c = order(j)
          mask(c >>> 6) |= (1L << (c & 63))
          j += 1
        }
        var i = r0
        while (i < r1) {
          val row = rows(order(i))
          var w = 0
          while (w < words) {
            cnt += java.lang.Long.bitCount(row(w) & mask(w))
            w += 1
          }
          i += 1
        }
      } else {
        var i = r0
        while (i < r1) {
          val row = rows(order(i))
          var j = c0
          while (j < c1) {
            val c = order(j)
            if (((row(c >>> 6) >>> (c & 63)) & 1L) != 0L) cnt += 1
            j += 1
          }
          i += 1
        }
      }
      cnt
    }
  }

  final case class MdlResult(mdl: Double, purity: Double)

  /** Description length of the matrix under `order` with pattern starts
    * `start` and counts (n_patterns, n_mids, n_receivers) — the semantics
    * of `compute_mdl` (`AA-Smurf.py:44-84`) over bitset adjacency. `order`
    * must already be extended to all n nodes.
    */
  /** `extraDOnes`: 1-cells known to lie strictly inside the D-block's
    * counted range but absent from `adj` — the summarized count of edges
    * whose endpoints can never be ordered (see [[runModelWithIds]]'s
    * induced-subgraph collect). 0 when `adj` holds the full matrix.
    */
  def computeMdl(adj: Adj, order: Array[Int], start: Array[Int],
                 count: Array[Int], extraDOnes: Long = 0L): MdlResult = {
    val n = adj.n
    var mdl = 0.0
    val purities = Array.ofDim[Double](start.length - 1)
    var idx = 1
    while (idx < start.length) {
      val s = start(idx - 1)
      val e = start(idx) - 1
      val k = e - s + 1
      // e1: edges among intermediaries (rows s+1..e-1, cols s..e-2)
      val e1 = adj.countBlock(order, s + 1, e, s, e - 1) *
        (2.0 * math.ceil(log2(k - 1.0)))
      // e2/e3: cross edges below/right of the block, excluding last row/col
      val bits = math.ceil(log2(n.toDouble)) + math.ceil(log2((n - k).toDouble))
      val e2 = adj.countBlock(order, e + 1, n - 1, s, e) * bits
      val e3 = adj.countBlock(order, s, e, e + 1, n - 1) * bits
      mdl += e1 + e2 + e3
      val sumAbc = adj.countBlock(order, s, e, s, e) +
        adj.countBlock(order, e + 1, n - 1, s, e) +
        adj.countBlock(order, s, e, e + 1, n - 1)
      purities(idx - 1) =
        if (sumAbc == 0) 0.0 else (k - 2.0) * 2.0 / sumAbc
      idx += 1
    }
    // D block: count of ZEROS in [start.last, n-1) × [start.last, n-1)
    val dDim = (n - 1 - start.last).max(0).toLong
    val dOnes = adj.countBlock(order, start.last, n - 1, start.last, n - 1) +
      extraDOnes
    mdl += (dDim * dDim - dOnes) * (2.0 * math.ceil(log2(n.toDouble)))
    // header terms
    mdl += math.ceil(logStar(count(0).toDouble)) +
      math.ceil(logStar(count(1).toDouble))
    mdl += count.map(_.toLong).sum * math.ceil(log2(n.toDouble))
    mdl += math.ceil(logStar((start.length - 1).toDouble))
    val pu =
      if (purities.isEmpty) Double.NaN else purities.sum / purities.length
    MdlResult(mdl, pu)
  }

  /** Model selection (§2.6, `AA-Smurf.py:162`): the iteration BEFORE the
    * first whose value is strictly within 10% of the final; python's
    * `idx - 1 = -1` wraps to the LAST element (faithful quirk). Shared by
    * [[greedyOrder]] and the q54 oracle query.
    */
  def selectIteration(trace: IndexedSeq[Double]): Int = {
    val fin = trace.last
    val firstIdx = trace.indexWhere(_ < fin * 1.1)
    if (firstIdx - 1 < 0) trace.length - 1 else firstIdx - 1
  }

  /** The MDL bit-cost block sums (A15) + purity (M7) as a DISTRIBUTED
    * conditional aggregation — the oracle-checkable face of [[computeMdl]]:
    * with the identity order (nodes dense-ranked ascending, numpy.unique's
    * order) and fixed pattern blocks of `blockSize` at positions
    * [b·B, (b+1)·B), every term of the description length is a conditional
    * count over the position-labeled edge list. AaSmurfSpec cross-checks
    * this table against `computeMdl` on the same matrix bit-for-bit.
    *
    * Output: one row per pattern block (blk = 0..numBlocks−1) with the
    * three cross-count regions, the core count, the block's MDL bit term
    * and its purity, plus the D-block row (blk = numBlocks, zeros encoded,
    * last row/col excluded — the reference's quirk) with purity NULL.
    *
    * Scale shape: one global dense-rank of the (small) node set, two
    * broadcast joins to position-label edges, one aggregation pass per
    * block over the edge list — no shuffle of the edge table beyond the
    * position lookups.
    */
  def mdlBlockCosts(edgesDf: DataFrame, blockSize: Int = 20,
                    numBlocks: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // persisted across the two actions below (node count, region agg) —
    // otherwise each re-derives the upstream edge join + distinct
    val bin = graft.ops.GraphOps.binaryEdges(edgesDf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = graft.ops.GraphOps.nodes(bin)
    // distributed rank, not row_number over a global window (which would
    // funnel every node through one task); persisted because it is joined
    // on both endpoints below. No broadcast hint: the position table is
    // the FULL node universe — AQE auto-broadcasts it iff it's small.
    // n rides out of the rank's own offsets pass — the previous draft
    // paid a separate nodes.count(), a third full evaluation of the
    // node-universe distinct.
    val (pos0, n) = graft.ops.GraphOps
      .withPositionCounted(nodes, "pos", col("id").asc)
    require(n > (numBlocks.toLong * blockSize) + 1,
      s"mdlBlockCosts: n=$n too small for $numBlocks blocks of $blockSize")
    val pos = pos0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pe = bin
      .join(pos.select(col("id").as("src"), col("pos").as("pi")), "src")
      .join(pos.select(col("id").as("dst"), col("pos").as("pj")), "dst")
      .select(col("pi"), col("pj"))

    def cnt(r0: Long, r1: Long, c0: Long, c1: Long) =
      sum(when(col("pi") >= r0 && col("pi") < r1 &&
        col("pj") >= c0 && col("pj") < c1, 1L).otherwise(0L))

    // ONE aggregation pass computes every region count (a per-block
    // union of aggregates would re-evaluate the position-labeling
    // pipeline once per block); the single bounded row (4·blocks+1
    // longs) comes to the driver and the bit-cost arithmetic — the same
    // expressions computeMdl evaluates — assembles the output rows.
    val defs = (0 until numBlocks).map { blk =>
      (blk, blk.toLong * blockSize, blk.toLong * blockSize + blockSize - 1)
    }
    val dStart = numBlocks.toLong * blockSize
    val aggs = defs.flatMap { case (blk, s, e) =>
      Seq(cnt(s + 1, e, s, e - 1).as(s"mid_$blk"),
        cnt(e + 1, n - 1, s, e).as(s"below_$blk"),
        cnt(s, e, e + 1, n - 1).as(s"right_$blk"),
        cnt(s, e, s, e).as(s"core_$blk"))
    } :+ cnt(dStart, n - 1, dStart, n - 1).as("core_d")
    val r = pe.agg(aggs.head, aggs.tail: _*).collect()(0)
    bin.unpersist(blocking = false)
    pos.unpersist(blocking = false)
    def g(c: String) = r.getAs[Long](c)

    val k = blockSize.toDouble
    val e1Bits = 2.0 * math.ceil(math.log(k - 1.0) / math.log(2.0))
    val bits = math.ceil(math.log(n.toDouble) / math.log(2.0)) +
      math.ceil(math.log(n.toDouble - k) / math.log(2.0))
    val dDim = (n - 1 - dStart).max(0L)
    val nBits = 2.0 * math.ceil(math.log(n.toDouble) / math.log(2.0))
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = defs.map { case (blk, _, _) =>
      val sumAbc = g(s"core_$blk") + g(s"below_$blk") + g(s"right_$blk")
      Row(blk, g(s"mid_$blk"), g(s"below_$blk"), g(s"right_$blk"),
        g(s"core_$blk"),
        g(s"mid_$blk") * e1Bits +
          (g(s"below_$blk") + g(s"right_$blk")) * bits,
        // computeMdl maps an empty block to purity 0.0, not null
        if (sumAbc == 0L) 0.0 else (k - 2.0) * 2.0 / sumAbc)
    } :+ Row(numBlocks, 0L, 0L, 0L, g("core_d"),
      (dDim * dDim - g("core_d")) * nBits, null)
    val schema = StructType(Seq(
      StructField("blk", IntegerType, nullable = false),
      StructField("ones_mid", LongType, nullable = false),
      StructField("ones_below", LongType, nullable = false),
      StructField("ones_right", LongType, nullable = false),
      StructField("ones_core", LongType, nullable = false),
      StructField("mdl_term", DoubleType, nullable = false),
      StructField("purity", DoubleType, nullable = true)))
    val spark = edgesDf.sparkSession
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  final case class Candidate(i: Int, j: Int, cnt: Long, mids: Array[Int])

  final case class SmurfModel(
    order: Array[Int],       // full permutation (node positions)
    start: Array[Int],       // block start positions
    mdlTrace: Array[Double], // MDL per committed iteration (incl. init)
    finalMdl: Double,
    iterations: Int)

  /** The greedy loop (`AA-Smurf.py:133-163`) over local adjacency +
    * pre-mined candidates (sorted by 2-hop count desc, `AA-Smurf.py:110`).
    */
  def greedyOrder(adj: Adj, candidates: Array[Candidate],
                  maxIter: Option[Int] = None,
                  restOnes: Long = 0L): SmurfModel = {
    val n = adj.n
    val initMdl = {
      // zeros(A) · 2⌈log2 n⌉ over the FULL matrix (AA-Smurf.py:133);
      // restOnes stands in for edges summarized out of `adj`
      var ones = restOnes
      var i = 0
      while (i < n) { ones += adj.rowOnes(i); i += 1 }
      math.ceil((n.toLong * n - ones).toDouble) * (2.0 * math.ceil(log2(n.toDouble)))
    }

    var order = Vector.empty[Int]
    var start = Vector(0)
    var count = Array(0, 0, 0)
    val mdlTrace = scala.collection.mutable.ArrayBuffer(initMdl)
    val orderTrace = scala.collection.mutable.ArrayBuffer(order)
    val startTrace = scala.collection.mutable.ArrayBuffer(start)
    var iter = 0
    var done = false
    while (!done) {
      val prevMdl = mdlTrace.last
      val inOrder = order.toSet
      // score every still-applicable candidate in parallel (joblib → par)
      val scored = candidates.par.flatMap { c =>
        // c.i == c.j (a 2-hop CYCLE — the A·A diagonal) would append the
        // node twice and break the permutation; the reference appends
        // key[0] and key[1] unconditionally (`AA-Smurf.py:117-122`) and
        // would corrupt `order` the same way on cyclic graphs — its eval
        // graphs never exercise it. Intended semantics: a smurf block is a
        // fan-out/fan-in PAIR, so self-pairs are skipped (SURVEY §7.4
        // divergence policy).
        if (c.i == c.j || inOrder.contains(c.i) || inOrder.contains(c.j)) None
        else {
          val mids = c.mids.filter(m => !inOrder.contains(m) &&
            m != c.i && m != c.j)
          if (mids.isEmpty) None
          else {
            val tentative = (order :+ c.i) ++ mids :+ c.j
            val tStart = (start :+ tentative.length).toArray
            val rest = (0 until n).iterator
              .filterNot(tentative.toSet).toArray
            val full = tentative.toArray ++ rest
            val tCount = Array(count(0) + 1, count(1) + mids.length,
              count(2) + 1)
            val r = computeMdl(adj, full, tStart, tCount, restOnes)
            if (r.mdl < prevMdl) {
              val score = (prevMdl - r.mdl) / prevMdl * r.purity
              Some((score, r.mdl, tentative, tStart, tCount))
            } else None
          }
        }
      }.toArray
      if (scored.isEmpty ||
          maxIter.exists(m => iter > m)) {
        done = true
      } else {
        val best = scored.maxBy(_._1)
        order = best._3
        start = best._4.toVector
        count = best._5
        mdlTrace += best._2
        orderTrace += order
        startTrace += start
        iter += 1
        if (maxIter.exists(m => iter > m)) done = true
      }
    }

    // model selection: iteration BEFORE the first within 10% of final MDL
    val selIdx = selectIteration(mdlTrace.toIndexedSeq)
    val selOrder = orderTrace(selIdx)
    val selStart = startTrace(selIdx)
    val inSel = selOrder.toSet
    val fullOrder = selOrder.toArray ++
      (0 until n).iterator.filterNot(inSel).toArray

    SmurfModel(fullOrder, selStart.toArray, mdlTrace.toArray,
      mdlTrace(selIdx), iter)
  }

  /** End-to-end over an edge DataFrame: mine candidates distributed, then
    * reorder the induced core locally. Returns the position-labeled node
    * table `(pos, node, mdl, iterations)`.
    */
  def run(spark: SparkSession, edges: DataFrame, minCount: Long = 3,
          maxIter: Option[Int] = None,
          maxCandidates: Option[Int] = None): DataFrame = {
    val (model, nodeIds) =
      runModelWithIds(spark, edges, minCount, maxIter, maxCandidates)
    val rows = model.order.zipWithIndex.map { case (node, pos) =>
      (pos.toLong, nodeIds(node), model.finalMdl, model.iterations.toLong)
    }
    spark.createDataFrame(rows.toSeq)
      .toDF("pos", "node", "mdl", "iterations")
  }

  /** As `run`, but returns the raw model (mdlTrace, order over dense
    * indices) for tests/diagnostics.
    */
  def runModel(spark: SparkSession, edges: DataFrame, minCount: Long = 3,
               maxIter: Option[Int] = None,
               maxCandidates: Option[Int] = None): SmurfModel =
    runModelWithIds(spark, edges, minCount, maxIter, maxCandidates)._1

  private def runModelWithIds(spark: SparkSession, edges: DataFrame,
                              minCount: Long, maxIter: Option[Int],
                              maxCandidates: Option[Int] = None)
      : (SmurfModel, Array[Long]) = {
    import spark.implicits._
    val bin = graft.ops.GraphOps.binaryEdges(edges).cache()
    // Candidate list is the one driver collect whose SIZE the data
    // controls: a hub-dense graph can mint O(|V|²) qualifying (i,j)
    // pairs. `maxCandidates` caps it as a TOP-K in the same cnt-desc
    // priority the reference already processes candidates in
    // (`AA-Smurf.py:110`), so when the cap isn't hit the result is
    // bit-identical, and when it is hit the greedy sees exactly the
    // prefix it would have explored first anyway (the tie-broken
    // orderBy makes the truncation deterministic).
    val candsDf = graft.ops.GraphOps.twoHopMids(bin, minCount)
      .orderBy(col("cnt").desc, col("i"), col("j"))
    val cands = maxCandidates.fold(candsDf)(candsDf.limit).collect()

    // node universe: SORTED ascending (numpy.unique order, AA-Smurf.py:38)
    val nodeIds = graft.ops.GraphOps.nodes(bin)
      .orderBy(col("id")).as[Long].collect()
    val index = nodeIds.zipWithIndex.toMap
    val n = nodeIds.length

    // Collect only the CANDIDATE-TOUCHING subgraph, not the full edge set:
    // the greedy only ever orders nodes of T = candidate endpoints ∪
    // intermediaries, so any edge with both endpoints outside T can never
    // appear in a block/cross term — it only feeds the D-block's 1-count,
    // which a scalar summarizes. T is widened to T′ = T ∪ the |T|+1
    // largest node ids so the node at the final order position (the
    // largest UNORDERED dense index, which the D-block's last-row/col
    // exclusion skips) is provably in the collected set; every uncollected
    // edge then lies strictly inside the D-block's counted range for every
    // order the greedy can build, and `restOnes` is exact — greedyOrder
    // over (touching adj, restOnes) equals greedyOrder over the full
    // matrix bit-for-bit (AaSmurfSpec cross-checks). At scale this bounds
    // the driver at O(|edges touching candidates|), not O(|E|).
    val tIds = scala.collection.mutable.LinkedHashSet.empty[Long]
    cands.foreach { r =>
      tIds += r.getLong(0); tIds += r.getLong(1)
      r.getSeq[Long](3).foreach(tIds += _)
    }
    val tPrime = tIds.toSet ++ nodeIds.takeRight(tIds.size + 1)
    val tDf = broadcast(tPrime.toSeq.toDF("tid"))
    val touching = bin
      .join(tDf, bin("src") === tDf("tid"), "left_semi")
      .union(bin.join(tDf, bin("dst") === tDf("tid"), "left_semi"))
      .distinct()
      .as[(Long, Long)].collect()
    val totalOnes = bin.count()
    bin.unpersist()

    val adj = new Adj(n)
    touching.foreach { case (s, d) => adj.add(index(s), index(d)) }
    val restOnes = totalOnes - touching.length

    val candidates = cands.map { r =>
      Candidate(index(r.getLong(0)), index(r.getLong(1)), r.getLong(2),
        r.getSeq[Long](3).map(index).toArray)
    }
    (greedyOrder(adj, candidates, maxIter, restOnes), nodeIds)
  }
}
