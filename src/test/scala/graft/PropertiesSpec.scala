package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.algo.AaSmurf
import graft.ml.IForest

/** Property-based tests (SURVEY §5): invariants the operators must hold
  * for ANY input, not just the fixtures. Pure-Scala components get full
  * scalacheck sweeps; DataFrame-level invariants with a Spark round-trip
  * per case run under `SparkPropsSpec` with a reduced case count.
  */
object LocalPropsSpec extends Properties("local-invariants") {

  // ── greedy MDL loop (M6) ──
  private val edgeSetGen: Gen[(Int, Set[(Int, Int)])] = for {
    n <- Gen.choose(8, 40)
    density <- Gen.choose(1, 4)
    edges <- Gen.listOfN(n * density, for {
      i <- Gen.choose(0, n - 1)
      j <- Gen.choose(0, n - 1) if i != j
    } yield (i, j))
  } yield (n, edges.toSet)

  private def adjOf(n: Int, es: Set[(Int, Int)]): AaSmurf.Adj = {
    val a = new AaSmurf.Adj(n)
    es.foreach { case (i, j) => a.add(i, j) }
    a
  }

  private def candidatesOf(n: Int, es: Set[(Int, Int)]) = {
    // the same 2-hop mining semantics as GraphOps.twoHopMids, locally
    val out = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val in = es.groupBy(_._2).map { case (k, v) => k -> v.map(_._1) }
    // self-pairs (i == j, 2-hop cycles) are deliberately INCLUDED: the
    // A·A diagonal reaches the candidate list and greedyOrder must skip it
    (for {
      i <- 0 until n; j <- 0 until n
      mids = out.getOrElse(i, Set.empty) & in.getOrElse(j, Set.empty) -
        i - j
      if mids.size >= 3
    } yield AaSmurf.Candidate(i, j, mids.size.toLong,
      mids.toArray.sorted)).toArray
      .sortBy(c => (-c.cnt, c.i, c.j))
  }

  property("MDL decreases strictly along committed iterations") =
    forAll(edgeSetGen) { case (n, es) =>
      val m = AaSmurf.greedyOrder(adjOf(n, es), candidatesOf(n, es))
      m.mdlTrace.sliding(2).forall(w => w.length < 2 || w(1) < w(0))
    }

  property("greedy order is a permutation of 0..n-1") =
    forAll(edgeSetGen) { case (n, es) =>
      val m = AaSmurf.greedyOrder(adjOf(n, es), candidatesOf(n, es))
      m.order.sorted.sameElements(0 until n)
    }

  property("selected MDL is within the committed trace") =
    forAll(edgeSetGen) { case (n, es) =>
      val m = AaSmurf.greedyOrder(adjOf(n, es), candidatesOf(n, es))
      m.mdlTrace.contains(m.finalMdl)
    }

  // ── universal code length / path length (scalar fns) ──
  // ── word-parallel Adj.countBlock ──
  // the mask-and-popcount wide path (cols ≥ 64) and the bit-probe narrow
  // path must agree with the brute-force double loop for any permutation
  // and any block; n up to 160 exercises both paths and word boundaries
  private val blockCaseGen = for {
    (n0, es) <- edgeSetGen
    n = n0 + 120 // push past one 64-bit word so wide blocks occur
    order <- Gen.const(new scala.util.Random(n0.toLong).shuffle(
      (0 until n).toVector).toArray)
    r0 <- Gen.choose(0, n - 1); r1 <- Gen.choose(r0, n)
    c0 <- Gen.choose(0, n - 1); c1 <- Gen.choose(c0, n)
  } yield (n, es, order, r0, r1, c0, c1)

  property("countBlock equals brute-force over any permuted block") =
    forAll(blockCaseGen) { case (n, es, order, r0, r1, c0, c1) =>
      val adj = adjOf(n, es)
      var expect = 0L
      for (i <- r0 until r1; j <- c0 until c1)
        if (adj.has(order(i), order(j))) expect += 1
      adj.countBlock(order, r0, r1, c0, c1) == expect
    }

  property("rowOnes counts each row's set bits") =
    forAll(edgeSetGen) { case (n, es) =>
      val adj = adjOf(n, es)
      (0 until n).forall(i => adj.rowOnes(i) == es.count(_._1 == i))
    }

  property("logStar is 2·log2(x)+1 and monotone for x>1") =
    forAll(Gen.choose(1.001, 1e9)) { x =>
      val v = AaSmurf.logStar(x)
      math.abs(v - (2 * math.log(x) / math.log(2) + 1)) < 1e-9 &&
        AaSmurf.logStar(x * 2) > v
    }

  property("iForest avgPathLength: 0 for n<2, monotone, < log2(n)·2+2") =
    forAll(Gen.choose(0L, 1L << 40)) { n =>
      val c = IForest.avgPathLength(n)
      if (n < 2) c == 0.0
      else c > 0 && c <= IForest.avgPathLength(n + 1) &&
        c < 2 * (math.log(n.toDouble) / math.log(2)) + 2
    }

  // ── iForest scoring (M3) ──
  private val pointsGen: Gen[Array[Array[Double]]] = for {
    n <- Gen.choose(8, 200)
    pts <- Gen.listOfN(n, Gen.zip(
      Gen.choose(-1e3, 1e3), Gen.choose(-1e3, 1e3)))
  } yield pts.map(p => Array(p._1, p._2)).toArray

  property("iForest scores lie in (0,1) and are seed-deterministic") =
    forAll(pointsGen) { pts =>
      val f1 = IForest.fit(pts, numTrees = 20, tag = "t7")
      val f2 = IForest.fit(pts, numTrees = 20, tag = "t7")
      pts.forall { p =>
        val s = f1.score(p)
        s > 0.0 && s < 1.0 && s == f2.score(p)
      }
    }

  // ── LogReg normal-equation solver ──
  // random well-conditioned SPD systems A = B'B + I: the solve must
  // satisfy A·x = b to numerical precision at every size IRLS uses
  private val spdGen: Gen[(Array[Array[Double]], Array[Double])] = for {
    p <- Gen.choose(1, 6)
    bs <- Gen.listOfN(p * p, Gen.choose(-3.0, 3.0))
    rhs <- Gen.listOfN(p, Gen.choose(-10.0, 10.0))
  } yield {
    val bm = bs.toArray.grouped(p).toArray
    val a = Array.tabulate(p, p) { (i, j) =>
      (0 until p).map(k => bm(k)(i) * bm(k)(j)).sum +
        (if (i == j) 1.0 else 0.0)
    }
    (a, rhs.toArray)
  }

  property("LogReg.solve satisfies A·x = b on random SPD systems") =
    forAll(spdGen) { case (a, b) =>
      val x = graft.ml.LogReg.solve(a, b)
      val p = b.length
      (0 until p).forall { i =>
        val ax = (0 until p).map(j => a(i)(j) * x(j)).sum
        math.abs(ax - b(i)) <= 1e-8 * math.max(1.0, math.abs(b(i)))
      }
    }

  // ── TxLog manifest-line codec ──
  // render→parse must be the identity for every representable entry:
  // a corrupted round-trip silently drops files (or their stats) from a
  // SNAPSHOT. Doubles cover negatives, subnormals, and ±Infinity (NaN
  // excluded: a recorded min/max is never NaN, and NaN ≠ NaN would
  // break the equality under test, not the codec).
  private val entryGen: Gen[graft.ops.TxLog.FileEntry] = for {
    depth <- Gen.choose(1, 3)
    segs <- Gen.listOfN(depth, Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('_', '-', '.', '='))).map(_.mkString))
    rows <- Gen.oneOf(Gen.const(-1L), Gen.choose(0L, Long.MaxValue))
    nStats <- Gen.choose(0, 4)
    cols <- Gen.listOfN(nStats,
      Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString))
    vals <- Gen.listOfN(nStats, for {
      mn <- Gen.oneOf(Gen.choose(-1e18, 1e18), Gen.oneOf(
        Double.MinPositiveValue, Double.NegativeInfinity,
        Double.PositiveInfinity, -0.0, 4.9e-324))
      mx <- Gen.choose(-1e18, 1e18)
    } yield (mn, mx))
    kind <- Gen.oneOf("data", "dv")
  } yield graft.ops.TxLog.FileEntry(segs.mkString("/"), rows,
    cols.zip(vals).toMap, kind)

  property("TxLog manifest codec round-trips every representable entry") =
    forAll(entryGen) { e =>
      graft.ops.TxLog.parseEntry(graft.ops.TxLog.renderEntry(e)) == e
    }
}

/** DataFrame-level invariants — each case pays a Spark job, so the case
  * count is deliberately small.
  */
class SparkPropsSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def edgeDf(rows: Seq[(Long, Long, Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("src", "dst", "weight", "ts")
  }

  private val rng = new scala.util.Random(42)
  private def randomEdges(n: Int, ids: Int, tsMax: Int) =
    Seq.fill(n)((rng.nextInt(ids).toLong, rng.nextInt(ids).toLong,
      rng.nextInt(1000).toLong + 1, rng.nextInt(tsMax).toLong))

  test("Σ multi_in_degree = Σ multi_out_degree = |E| (A1-A8 conservation)") {
    for (_ <- 1 to 3) {
      val e = edgeDf(randomEdges(300, 40, 50))
      val f = graft.ops.Features.accountFeatures(e)
      val r = f.agg(sum("multi_in_degree"), sum("multi_out_degree")).head()
      assert(r.getLong(0) == 300 && r.getLong(1) == 300)
    }
  }

  test("window explode conserves edges: Σ per-wid counts = Σ multiplicity") {
    for (_ <- 1 to 3) {
      val e = edgeDf(randomEdges(200, 30, 60))
      val w = graft.ops.Windows.withWindowId(e, 14, 7)
      // every (edge, wid) satisfies the window's half-open range
      val bad = w.filter(!(col("ts") >= col("w_start") &&
        col("ts") < col("w_start") + 14)).count()
      assert(bad == 0)
      // multiplicity ≤ ⌈w/stride⌉ = 2
      val maxRep = w.groupBy("src", "dst", "weight", "ts")
        .count().agg(max("count")).head().getLong(0)
      assert(maxRep <= 2)
    }
  }

  test("permuteEdges preserves the edge multiset (M8 invariance)") {
    val e = edgeDf(randomEdges(150, 25, 10)).select("src", "dst").distinct()
    val nodes = graft.ops.GraphOps.nodes(e)
    val pos = nodes.orderBy(desc("id"))
      .withColumn("pos", monotonically_increasing_id())
    val permuted = graft.ops.GraphOps.permuteEdges(e, pos)
    assert(permuted.count() == e.count())
  }

  test("cosine distance ∈ [0,2]; Jaccard ∈ [0,1] on random arrays") {
    val s = spark
    import s.implicits._
    val df = Seq.fill(30)((
      Seq.fill(8)(rng.nextDouble() * 2 - 1),
      Seq.fill(8)(rng.nextDouble() * 2 - 1),
      Seq.fill(5)(rng.nextInt(10).toLong).distinct,
      Seq.fill(5)(rng.nextInt(10).toLong).distinct
    )).toDF("u", "v", "a", "b")
    val r = df.select(
      graft.ops.Scoring.cosineDistance(col("u"), col("v")).as("cd"),
      graft.ext.Dedup.jaccardArrays(col("a"), col("b")).as("j"))
      .agg(min("cd"), max("cd"), min("j"), max("j")).head()
    assert(r.getDouble(0) >= 0.0 && r.getDouble(1) <= 2.0 + 1e-12)
    assert(r.getDouble(2) >= 0.0 && r.getDouble(3) <= 1.0 + 1e-12)
  }

  test("packSequences: per-language starts are the gap-free running sum") {
    val s = spark
    import s.implicits._
    for (_ <- 1 to 3) {
      val docs = Seq.tabulate(40)(i =>
        (if (i % 2 == 0) "en" else "de", i.toLong,
          rng.nextInt(30).toLong + 1))
        .toDF("lang_pred", "doc_id", "n_tokens")
      val p = graft.ext.TextOps.packSequences(docs, seqLen = 16)
      val rows = p.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3) * 16 + r.getLong(4)))
      // seq_id*L + seq_offset reconstructs the concat position exactly:
      // within each language, doc i starts where doc i−1's tokens (+EOS)
      // ended — contiguous, gap-free, no token lost or double-packed
      rows.groupBy(_._1).values.foreach { g =>
        var cum = 0L
        g.sortBy(_._2).foreach { case (_, _, n, start) =>
          assert(start == cum, s"gap at start=$start cum=$cum")
          cum += n + 1
        }
      }
      assert(p.filter(col("seq_offset") < 0 ||
        col("seq_offset") >= 16).count() == 0)
    }
  }

  test("contaminationOverlap: bounded by the doc's own distinct grams") {
    val s = spark
    import s.implicits._
    val words = Seq("alpha", "beta", "gamma", "delta", "eps")
    def text() = Seq.fill(rng.nextInt(12) + 5)(
      words(rng.nextInt(words.size))).mkString(" ")
    val docs = Seq.tabulate(30)(i => (i.toLong, text()))
      .toDF("doc_id", "text")
    val train = docs.filter(col("doc_id") % 3 =!= 0)
    val bench = docs.filter(col("doc_id") % 3 === 0)
    val got = graft.ext.TextOps.contaminationOverlap(train, bench, n = 3)
    // every train doc appears exactly once; overlap ≤ its own distinct
    // 3-gram count; flag consistent with the count
    assert(got.count() == train.count())
    val own = train.select(col("doc_id"),
      size(array_distinct(graft.ext.TextOps.wordNgrams(col("text"), 3)))
        .as("n_own"))
    val joined = got.join(own, "doc_id")
    assert(joined.filter(col("n_shared_ngrams") > col("n_own")).count() == 0)
    assert(joined.filter(col("contaminated") =!=
      (col("n_shared_ngrams") > 0)).count() == 0)
  }

  test("semDedup keep-set: τ≤−1 keeps exactly one per nonempty cell, τ>1 all") {
    val s = spark
    import s.implicits._
    for (_ <- 1 to 3) {
      val vecs = Seq.tabulate(60)(i => (i.toLong,
        Seq.fill(8)((rng.nextDouble() * 2 - 1).toFloat)))
        .toDF("vec_id", "embedding")
      val centers = Array.fill(4)(Array.fill(8)(rng.nextDouble() * 2 - 1))
      // τ ≤ −1: every same-cell pair qualifies, so pairwise dominance on
      // (d2c desc, id asc) prunes all but one vector per cell — the
      // farthest-from-centroid survivor can have no dominator
      val all = graft.ext.Dedup.semDedup(vecs, centers, minCos = -1.1)
      assert(all.count() == 60)
      val kept = all.filter(col("keep"))
      val cells = all.select(col("cell")).distinct().count()
      assert(kept.count() == cells,
        s"expected one survivor per cell ($cells), got ${kept.count()}")
      // τ > 1: cosine can never reach it, nothing is pruned
      val none = graft.ext.Dedup.semDedup(vecs, centers, minCos = 1.1)
      assert(none.filter(!col("keep")).count() == 0)
    }
  }

  test("piiScrub: clean text passes through verbatim, planted PII never survives") {
    val s = spark
    import s.implicits._
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon")
    def text() = Seq.fill(rng.nextInt(12) + 3)(
      words(rng.nextInt(words.size))).mkString(" ")
    val clean = Seq.tabulate(25)(i => (i.toLong, text()))
    val dirty = Seq.tabulate(25)(i => (100L + i,
      text() + s" user$i@host$i.com " + text()))
    val got = graft.ext.TextOps.piiScrub(
      (clean ++ dirty).toDF("doc_id", "text"))
    // PII-free docs: zero counts, byte-identical passthrough
    val c = got.filter(col("doc_id") < 100)
    assert(c.filter(col("n_emails") + col("n_ipv4") + col("n_phones")
      =!= 0).count() == 0)
    val orig = (clean ++ dirty).toDF("doc_id", "orig")
    assert(got.join(orig, "doc_id")
      .filter(col("doc_id") < 100)
      .filter(col("clean_text") =!= col("orig")).count() == 0)
    // planted emails: counted once, no '@' survives masking
    val d = got.filter(col("doc_id") >= 100)
    assert(d.filter(col("n_emails") =!= 1).count() == 0)
    assert(d.filter(col("clean_text").contains("@")).count() == 0)
  }

  test("sourceMixWeights: shares sum to 1, weights in (0, cap]") {
    val s = spark
    import s.implicits._
    for (_ <- 1 to 3) {
      val rows = Seq.fill(200)((s"src${rng.nextInt(12)}",
        rng.nextInt(500).toLong + 1))
      val got = graft.ext.TextOps.sourceMixWeights(
        rows.toDF("source", "n_tokens"), cap = 5.0)
      val shareSum = got.agg(sum(col("token_share"))).head().getDouble(0)
      assert(math.abs(shareSum - 1.0) < 1e-4, s"share sum $shareSum")
      assert(got.filter(col("mix_weight") <= 0.0 ||
        col("mix_weight") > 5.0).count() == 0)
    }
  }

  test("zipfStats: ranks are dense 1..N with non-increasing frequency") {
    val s = spark
    import s.implicits._
    val words = Vector("kappa", "lambda", "mu", "nu", "xi", "omicron")
    def text() = Seq.fill(rng.nextInt(20) + 5)(
      words(rng.nextInt(words.size))).mkString(" ")
    val docs = Seq.tabulate(20)(i => (i.toLong, text()))
      .toDF("doc_id", "text")
    val got = graft.ext.TextOps.zipfStats(docs, topN = 100)
      .orderBy(col("rnk")).collect()
    assert(got.map(_.getLong(1)).toSeq == (1L to got.length))
    val freqs = got.map(_.getLong(2))
    assert(freqs.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("all-zero focus plot sketches to zero") {
    val s = spark
    import s.implicits._
    // a focus table with all-zero scores must produce all-zero sketches
    val focus = (for (w <- 0L to 3L; a <- 0L to 20L; p <- 0 to 5)
      yield (w, a, p, 0.0)).toDF("wid", "account", "pair_id", "score")
    val sk = graft.algo.AaAr.sketches(focus, sketchNum = 8, numDst = 2,
      seed = 1L)
    val nz = sk.filter(abs(col("value")) > 1e-15).count()
    assert(nz == 0)
  }

  test("triangleCounts equals the brute-force triple scan on random " +
      "graphs") {
    val s = spark
    import s.implicits._
    for (trial <- 1 to 4) {
      val n = 8 + trial * 3
      val es = randomEdges(n * 3, n, 10).map(e => (e._1, e._2))
      val got = graft.ops.GraphOps.triangleCounts(es.toDF("src", "dst"))
        .collect()
        .map(r => r.getAs[Long]("account") -> r.getAs[Long]("n_triangles"))
        .toMap
      // brute force over all vertex triples of the undirected simple graph
      val und = es.flatMap { case (a, b) =>
        if (a == b) Nil else Seq((a min b, a max b)) }.toSet
      val vs = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      val brute = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      for {
        i <- vs.indices; j <- (i + 1) until vs.size
        k <- (j + 1) until vs.size
        (x, y, z) = (vs(i), vs(j), vs(k))
        if und((x, y)) && und((x, z)) && und((y, z))
      } { brute(x) += 1; brute(y) += 1; brute(z) += 1 }
      assert(got === brute.toMap, s"trial $trial diverged")
    }
  }

  test("dyadic-CM rank estimates stay one-sided on random multisets") {
    val s = spark
    import s.implicits._
    for (trial <- 1 to 3) {
      val vals = Seq.fill(400)(rng.nextInt(3000).toLong)
      val out = graft.ext.Sketches.dyadicCmQuantiles(
        vals.toDF("v"), "v").collect()
      // exact quantile from the raw multiset; the estimate can only be
      // at or BELOW it (overcounted ranks cross the target early)
      val sorted = vals.sorted
      out.foreach { r =>
        val target = r.getAs[Long]("target_rank").toInt
        assert(r.getAs[Long]("q_exact") == sorted(target - 1),
          s"trial $trial: q_exact diverged from the sorted multiset")
        assert(r.getAs[Boolean]("est_le_exact"), s"trial $trial one-sided")
      }
    }
  }

  test("zValue is a bijection on the 16-bit grid (local deinterleave)") {
    val s = spark
    import s.implicits._
    def deinterleave(z: Long): (Long, Long) = {
      var (a, b) = (0L, 0L)
      for (i <- 0 until 16) {
        a |= ((z >> (2 * i)) & 1L) << i
        b |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (a, b)
    }
    val pts = Seq.fill(200)((rng.nextInt(65536).toLong,
      rng.nextInt(65536).toLong))
    val rows = pts.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.ops.Layout.zValue(col("a"), col("b")).as("z"))
      .collect()
    rows.foreach { r =>
      assert(deinterleave(r.getAs[Long]("z")) ===
        ((r.getAs[Long]("a"), r.getAs[Long]("b"))))
    }
  }
}
