package graft

import graft.algo.AaSmurf
import graft.algo.AaSmurf.{Adj, Candidate}

/** M6/M7/A15: MDL reordering on the hand-built 12-node smurf matrix
  * (FIXTURES.md §1.2b) + property tests (SURVEY §5: MDL decreases along
  * committed iterations).
  */
class AaSmurfSpec extends SparkSpec {
  import spark.implicits._

  /** 12 nodes; perfect smurf block 0 → {1,2,3,4} → 5 plus scattered noise. */
  private def smurfAdj(): Adj = {
    val adj = new Adj(12)
    Seq(0 -> 1, 0 -> 2, 0 -> 3, 0 -> 4,
        1 -> 5, 2 -> 5, 3 -> 5, 4 -> 5,
        6 -> 7, 8 -> 9, 10 -> 11, 7 -> 10)
      .foreach { case (i, j) => adj.add(i, j) }
    adj
  }

  test("logStar is 2·log2(x)+1") {
    assert(AaSmurf.logStar(8.0) == 7.0)
    assert(math.abs(AaSmurf.logStar(2.0) - 3.0) < 1e-12)
  }

  test("initial MDL equals zeros(A)·2⌈log2 n⌉ (AA-Smurf.py:133)") {
    val adj = smurfAdj()
    val model = AaSmurf.greedyOrder(adj, Array.empty)
    // 12 edges on a 12×12 matrix → 144−12=132 zeros; ⌈log2 12⌉=4
    assert(model.mdlTrace.head == 132.0 * 8.0)
  }

  test("greedy loop isolates the planted smurf block and lowers MDL") {
    val adj = smurfAdj()
    val cand = Array(Candidate(0, 5, 4, Array(1, 2, 3, 4)))
    val model = AaSmurf.greedyOrder(adj, cand)
    assert(model.iterations == 1)
    // committed block order: src, mids..., dst at the FRONT
    assert(model.order.take(6).toSet == Set(0, 1, 2, 3, 4, 5))
    assert(model.order.head == 0 && model.order(5) == 5)
    // MDL strictly decreases along committed iterations
    model.mdlTrace.sliding(2).foreach { case Array(a, b) => assert(b < a) }
  }

  test("permutation covers all nodes exactly once") {
    val adj = smurfAdj()
    val cand = Array(Candidate(0, 5, 4, Array(1, 2, 3, 4)))
    val model = AaSmurf.greedyOrder(adj, cand)
    assert(model.order.sorted.toSeq == (0 until 12))
  }

  test("induced-subgraph collect equals full-matrix greedy bit-for-bit") {
    // planted star on nodes 0..5 + a long chain among nodes 10..60: the
    // chain never yields a ≥3-count candidate, so most of its edges have
    // BOTH endpoints outside T′ and are summarized by restOnes rather than
    // collected — exactly the path runModelWithIds takes at scale
    val star = Seq(0 -> 1, 0 -> 2, 0 -> 3, 0 -> 4,
      1 -> 5, 2 -> 5, 3 -> 5, 4 -> 5)
    val chain = (10 until 60).map(i => i -> (i + 1))
    val all = (star ++ chain).map { case (s, d) => (s.toLong, d.toLong) }
    val edges = all.map { case (s, d) => (s, d, 1L, 0L) }
      .toDF("src", "dst", "weight", "ts")

    val model = AaSmurf.runModel(spark, edges, minCount = 3)

    // local reference: FULL adjacency, no summarization
    val ids = all.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val index = ids.zipWithIndex.toMap
    val adjFull = new Adj(ids.length)
    all.foreach { case (s, d) => adjFull.add(index(s), index(d)) }
    val cand = Array(Candidate(index(0L), index(5L), 4,
      Array(1L, 2L, 3L, 4L).map(index)))
    val ref = AaSmurf.greedyOrder(adjFull, cand)

    assert(model.mdlTrace.toSeq == ref.mdlTrace.toSeq)
    assert(model.finalMdl == ref.finalMdl)
    assert(model.order.toSeq == ref.order.toSeq)
    assert(model.iterations == ref.iterations)
  }

  test("selectIteration: 10%-of-final rule with the python -1 wrap") {
    // first value within 10% of final (=10.0, threshold <11.0) is idx 2 →
    // select idx 1
    assert(AaSmurf.selectIteration(IndexedSeq(100.0, 50.0, 10.5, 10.0)) == 1)
    // idx 0 already within 10% → 0-1 = -1 wraps to LAST
    assert(AaSmurf.selectIteration(IndexedSeq(10.5, 10.2, 10.0)) == 2)
    // no index strictly below the threshold (final = 0) → wrap to last
    assert(AaSmurf.selectIteration(IndexedSeq(5.0, 0.0)) == 1)
  }

  test("mdlBlockCosts matches computeMdl bit-for-bit under identity order") {
    val n = 50
    val blockSize = 5
    val edges = (for {
      i <- 0 until n; j <- 0 until n
      if i != j && (i * 31 + j * 17) % 23 < 3
    } yield (i.toLong, j.toLong, 1L, 0L)).toDF("src", "dst", "weight", "ts")

    val table = AaSmurf.mdlBlockCosts(edges, blockSize, numBlocks = 2)
      .collect().map(r => r.getAs[Int]("blk") -> r).toMap
    assert(table.size == 3)

    val adj = new Adj(n)
    edges.select($"src", $"dst").as[(Long, Long)].collect()
      .foreach { case (s, d) => adj.add(s.toInt, d.toInt) }
    val start = Array(0, blockSize, 2 * blockSize)
    val count = Array(2, 2 * (blockSize - 2), 2)
    val ref = AaSmurf.computeMdl(adj, (0 until n).toArray, start, count)

    // per-block terms + the header terms reconstruct the full MDL exactly
    val headers = math.ceil(AaSmurf.logStar(count(0).toDouble)) +
      math.ceil(AaSmurf.logStar(count(1).toDouble)) +
      count.map(_.toLong).sum *
        math.ceil(math.log(n.toDouble) / math.log(2.0)) +
      math.ceil(AaSmurf.logStar((start.length - 1).toDouble))
    val total = table.values.map(_.getAs[Double]("mdl_term")).sum + headers
    assert(total == ref.mdl)
    val purities = Seq(0, 1).map(table(_).getAs[Double]("purity"))
    assert(purities.sum / purities.length == ref.purity)
    assert(table(2).isNullAt(table(2).fieldIndex("purity")))
  }

  test("end-to-end run recovers the planted star from an edge DataFrame") {
    val edges = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L),
      (1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L),
      (6L, 7L), (8L, 9L), (10L, 11L), (7L, 10L)
    ).map { case (s, d) => (s, d, 1L, 0L) }
      .toDF("src", "dst", "weight", "ts")
    val out = AaSmurf.run(spark, edges, minCount = 3)
    val posOf = out.select($"node", $"pos").as[(Long, Long)]
      .collect().toMap
    // the block members occupy the first 6 positions
    assert(Seq(0L, 1L, 2L, 3L, 4L, 5L).map(posOf).forall(_ < 6))
    assert(posOf(0L) == 0L && posOf(5L) == 5L)
  }

  test("an unreached candidate cap leaves the model bit-identical") {
    val edges = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L),
      (1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L),
      (6L, 1L), (6L, 2L), (6L, 3L),
      (1L, 7L), (2L, 7L), (3L, 7L),
      (8L, 9L), (10L, 11L), (7L, 10L)
    ).map { case (s, d) => (s, d, 1L, 0L) }
      .toDF("src", "dst", "weight", "ts")
    val un = AaSmurf.run(spark, edges, minCount = 3)
      .orderBy($"pos").collect().toSeq
    val cap = AaSmurf.run(spark, edges, minCount = 3,
        maxCandidates = Some(1000))
      .orderBy($"pos").collect().toSeq
    assert(un == cap)
  }

  test("SmurfSql unrolls maxIter+1 state CTEs with the call's parameters") {
    val sql = graft.algo.SmurfSql.q32Sql(maxNodeId = 300, minCount = 3,
      cap = 256, maxIter = 8)
    // 9 unrolled iterations: the loop can commit at most maxIter+1 times
    assert((1 to 9).forall(k => sql.contains(s"s$k AS MATERIALIZED")))
    assert(!sql.contains("s10 AS"))
    assert(sql.contains("QUALIFY rk <= 256"))
    assert(sql.contains("HAVING count(*) >= 3"))
    assert(sql.contains("src <= 300 AND dst <= 300"))
    // the ln-ratio bit-cost spelling, never a native log2 (scaladoc: the
    // JVM/DuckDB agreement was verified for THIS formula)
    assert(!sql.toLowerCase.contains("log2("))
  }
}
