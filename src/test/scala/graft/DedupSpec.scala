package graft

import graft.ext.Dedup
import org.apache.spark.sql.functions._

/** Dedup family: exact, shingles, MinHash-LSH, SimHash, n-gram Jaccard,
  * embedding near-dup (extension surface, SURVEY §7.5).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val loremA = "the quick brown fox jumps over the lazy dog " * 5
  private val loremB = "the quick brown fox leaps over the lazy dog " * 5
  private val other = "completely different content about spark engines " +
    "and distributed query processing at massive scale today"

  private lazy val docs = Seq(
    (1L, loremA), (2L, loremA), (3L, loremB), (4L, other)
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts under min doc_id") {
    val got = Dedup.exact(docs).collect()
      .map(r => r.getAs[Long]("canonical_doc_id") ->
        r.getAs[Long]("n_dups")).toMap
    assert(got(1L) == 2)  // docs 1,2 identical
    assert(got(3L) == 1)
    assert(got(4L) == 1)
  }

  test("shingles: n-grams of the token stream, distinct") {
    val sh = Seq((1L, "a b c d")).toDF("doc_id", "text")
      .select(Dedup.shingles($"text", 3)).as[Seq[String]].collect().head
    assert(sh.toSet == Set("a b c", "b c d"))
    val short = Seq((1L, "a b")).toDF("doc_id", "text")
      .select(Dedup.shingles($"text", 3)).as[Seq[String]].collect().head
    assert(short.isEmpty)
  }

  test("minhash LSH pairs identical docs at jaccard 1.0, near at high j") {
    // 16 bands of 2 rows: detection prob for j=0.5 is 1−(1−0.25)¹⁶ ≈ 0.99
    // (8 bands of 4 would deterministically miss this fixture's j=0.5 pair)
    val pairs = Dedup.minhashLshPairs(docs, bands = 16, minJaccard = 0.2)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs.get((1L, 3L)).exists(j => j > 0.2 && j < 1.0))
    assert(!pairs.keySet.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("minhash signature: k KM-scheme minima, permutation-invariant") {
    val sig = Seq((1L, Seq("a b c", "b c d")), (2L, Seq("b c d", "a b c")))
      .toDF("doc_id", "sh")
      .select($"doc_id", Dedup.minhashSignature($"sh", k = 8).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sig(1L).length == 8)
    assert(sig(1L) == sig(2L)) // set semantics: order of shingles irrelevant
    assert(sig(1L).forall(v => v >= 0)) // 28-bit halves: never negative
  }

  test("simhash: identical docs get identical signatures, similar docs " +
    "have small hamming distance") {
    val sigs = Dedup.simhash(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sigs(1L) == sigs(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sigs(1L), sigs(3L)) < hamming(sigs(1L), sigs(4L)))
  }

  test("simhashPairs: identical docs at hamming 0, near pair found via " +
    "block candidates, dissimilar pair absent") {
    val got = Dedup.simhashPairs(docs, hamMax = 16).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("hamming")).toMap
    assert(got((1L, 2L)) == 0L)   // identical texts, identical signature
    // near pair (jumps→leaps) shares blocks with both copies
    assert(got.contains((1L, 3L)) && got((1L, 3L)) > 0L)
    assert(got((1L, 3L)) == got((2L, 3L)))
    // the unrelated doc never pairs
    assert(!got.keySet.exists { case (a, b) => a == 4L || b == 4L })
    // replay: hamming matches the signatures' xor popcount
    val sigs = Dedup.simhash(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(got((1L, 3L)) ==
      java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)).toLong)
  }

  test("ngram jaccard: hand-computed intersection") {
    val d = Seq((1L, "a b c d e"), (2L, "a b c d x"))
      .toDF("doc_id", "text")
    val got = Dedup.ngramJaccardPairs(d, n = 3, minJaccard = 0.0)
      .collect().head
    // shingles A: {abc, bcd, cde}; B: {abc, bcd, cdx} → inter 2, union 4
    assert(got.getAs[Long]("inter") == 2)
    assert(got.getAs[Double]("jaccard") == 0.5)
  }

  test("ngram jaccard maxDf gate: boilerplate shingle leaves the universe") {
    // "x y z" appears in all four docs (df 4 — boilerplate); docs 1/2
    // additionally share their real content, docs 3/4 share ONLY the
    // boilerplate shingle
    val d = Seq((1L, "a b c d x y z"), (2L, "a b c q x y z"),
        (3L, "p q r x y z"), (4L, "s t u x y z"))
      .toDF("doc_id", "text")
    val exact = Dedup.ngramJaccardPairs(d, n = 3, minJaccard = 0.0)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    // exact: every pair shares ≥ the boilerplate shingle → all 6 pairs
    assert(exact.length == 6)
    val gated = Dedup.ngramJaccardPairs(d, n = 3, minJaccard = 0.0,
        maxDf = 3)
      .collect().map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        r.getAs[Long]("inter"))).toMap
    // df-4 shingles ("x y z" and the per-doc bridges ending in x/x y)
    // leave BOTH the index and the sizes; only the real-content overlap
    // of (1,2) survives: shingles of "a b c (d|q) x" → inter = {"a b c"}
    assert(gated.keySet == Set((1L, 2L)), s"got $gated")
    assert(gated((1L, 2L)) == 1L)
  }

  test("connected components: chains merge, separate components stay apart") {
    val s = spark
    import s.implicits._
    // components: {1,2,3,9} via chain 1-2, 2-3, 3-9; {5,7}; isolated pairs
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 7L))
      .toDF("doc_a", "doc_b")
    val got = graft.ext.Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L && got(9L) == 1L)
    assert(got(5L) == 5L && got(7L) == 5L)
    assert(got.size == 6)
    // the distributed pointer-jumping path must agree with union-find
    val dist = graft.ext.Dedup.distributedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(dist == got)
  }

  test("embedding near-dup finds the duplicated vector") {
    val vecs = Seq(
      (1L, Seq.fill(8)(1.0f)),
      (2L, Seq.fill(8)(1.0f)),              // exact dup of 1
      (3L, Seq.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f))
    ).toDF("vec_id", "embedding")
    val got = Dedup.embeddingNearDupPairs(vecs, dim = 8, minCos = 0.99)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("semDedup keeps the LOWEST-cosine-to-centroid member, not nearest-L2") {
    // two well-separated clusters. Cluster A holds a near-dup pair built
    // so the L2 and cosine orderings DISAGREE: vector 1 = (30,0,0,0) is
    // FAR from the centroid (10,0,0,0) in L2 (d²=400) but perfectly
    // aligned (cos = 1.0); vector 2 = (10,1,0,0) is L2-close (d²=1) but
    // angled (cos ≈ 0.995). The paper's rule keeps the LOWEST cosine →
    // 2 survives and 1 is pruned — the opposite of an L2-proxy rule.
    // Vector 3 is in A but dissimilar enough to survive; cluster B's
    // lone member keeps.
    val vecs = Seq(
      (1L, Seq(30.0f, 0.0f, 0.0f, 0.0f)),    // near-dup of 2, cos-to-c = 1
      (2L, Seq(10.0f, 1.0f, 0.0f, 0.0f)),    // near-dup of 1, cos ≈ 0.995
      (3L, Seq(9.0f, 10.0f, 8.0f, -8.0f)),   // same cell, low pair cosine
      (4L, Seq(-10.0f, -10.0f, 0.0f, 0.0f))  // other cluster
    ).toDF("vec_id", "embedding")
    val centers = Array(Array(10.0, 0.0, 0.0, 0.0),
      Array(-10.0, -10.0, 0.0, 0.0))
    // pairwise cos(1,2) = 300/(30·√101) ≈ 0.99504 ≥ 0.99 → a dup pair
    val got = Dedup.semDedup(vecs, centers, minCos = 0.99)
      .select($"vec_id", $"cell", $"keep").as[(Long, Int, Boolean)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(!got(1L)._2 && got(2L)._2 && got(3L)._2 && got(4L)._2)
    assert(got(1L)._1 == got(2L)._1 && got(1L)._1 == got(3L)._1)
    assert(got(4L)._1 != got(1L)._1)
  }

  test("deriveNlist: floor at small corpora, √(n/64) growth, cap") {
    import graft.ext.SimSearch.deriveNlist
    assert(deriveNlist(500L) == 16)       // every test SF stays on the floor
    assert(deriveNlist(16384L) == 16)     // crossover point: √(16384/64)=16
    assert(deriveNlist(1048576L) == 128)  // √(2^20/64) = 128
    assert(deriveNlist(Long.MaxValue) == 4096) // capped
    assert(deriveNlist(0L) == 16)
  }

  test("removeDuplicateSpans: later copies of a tile drop, first stays") {
    // w=4 tiles; doc 1 tiles: [a b c d][e f g h]; doc 2 repeats doc 1's
    // first tile then adds its own; doc 3 is a full verbatim copy of
    // doc 1 (every tile duplicated → nothing kept)
    val d = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d x y z w"),
      (3L, "a b c d e f g h")
    ).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(d, winTokens = 4).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tiles"), r.getAs[Long]("n_kept"),
          r.getAs[String]("text_deduped")))).toMap
    assert(got(1L) == ((2L, 2L, "a b c d e f g h")))
    assert(got(2L) == ((2L, 1L, "x y z w")))
    assert(got(3L) == ((2L, 0L, "")))
  }

  test("removeDuplicateSpans: short tail tile dedups too, order kept") {
    val d = Seq(
      (1L, "p q r s t u"),   // tiles [p q r s][t u]
      (2L, "t u p q r s")    // tiles [t u p q][r s] — no verbatim tile dup
    ).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(d, winTokens = 4).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text_deduped")).toMap
    assert(got(1L) == "p q r s t u")
    assert(got(2L) == "t u p q r s")
  }

  test("bloomIncrementalDedup: no duplicate survives, new docs pass") {
    val history = (0L until 200L).map(i => (i, s"history doc number $i"))
      .toDF("doc_id", "text")
    // batch: 100 verbatim re-deliveries + 100 genuinely new docs
    val batch = ((0L until 100L).map(i => (1000L + i, s"history doc number $i")) ++
      (0L until 100L).map(i => (2000L + i, s"fresh doc number $i")))
      .toDF("doc_id", "text")
    val kept = Dedup.bloomIncrementalDedup(history, batch)
      .select($"doc_id").as[Long].collect().toSet
    // one-sided guarantee: every true duplicate is GONE
    assert(kept.forall(_ >= 2000L), s"a duplicate survived: $kept")
    // fpp=1e-3 over 100 fresh docs: expected fp ≈ 0.1 — allow a couple
    assert(kept.size >= 98, s"too many fresh docs dropped: ${kept.size}")
  }

  test("incrementalNeardup: batch near-dups of history found with exact " +
      "jaccard; fresh docs and within-batch pairs are not emitted") {
    def doc(i: Long, words: Seq[String]) = (i, words.mkString(" "))
    val base = (0 until 40).map(j => s"w$j")
    // history (even ids): doc 0 = base text, doc 2 = unrelated
    val history = Seq(doc(0L, base),
      doc(2L, (100 until 140).map(j => s"u$j")))
      .toDF("doc_id", "text")
    // batch (odd ids): 1 = near-copy of 0 (one word changed), 3 =
    // fresh, 5 = near-copy of 3 (within-batch only -> must NOT emit)
    val fresh = (200 until 240).map(j => s"f$j")
    val batch = Seq(doc(1L, base.updated(20, "CHANGED")),
      doc(3L, fresh), doc(5L, fresh.updated(5, "ALSO")))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalNeardup(history, batch, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2))).toList
    assert(got.map(t => (t._1, t._2)) == List((1L, 0L)), s"got $got")
    // exact jaccard of the planted pair, computed independently from
    // the texts with the operator's 3-token shingles
    val shA = base.sliding(3).map(_.mkString(" ")).toSet
    val shB = base.updated(20, "CHANGED").sliding(3)
      .map(_.mkString(" ")).toSet
    val expected = shA.intersect(shB).size.toDouble /
      shA.union(shB).size
    assert(math.abs(got.head._3 - expected) < 1e-12)
  }

  test("containmentPairs flags a short quote inside a long page that " +
      "Jaccard cannot see; direction and threshold honored") {
    import spark.implicits._
    val quote = (0 until 40).map(j => s"q$j")
    val page = (100 until 280).map(j => s"w$j") ++ quote ++
      (300 until 480).map(j => s"x$j")
    val docs = Seq(
      (1L, quote.mkString(" ")),           // the excerpt
      (2L, page.mkString(" ")),            // the containing page
      (3L, (500 until 540).map(j => s"z$j").mkString(" "))) // unrelated
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, minContainment = 0.8)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("contained_in"), r.getAs[Double]("containment")))
    // ONLY quote→page: the page is not contained in the quote, and the
    // unrelated doc pairs with nothing
    assert(got.map(t => (t._1, t._2)).toSeq == Seq((1L, 2L)), got.toSeq)
    assert(got.head._3 == 1.0, "verbatim quote must contain fully")
    // the SAME pair under symmetric Jaccard sits far below any usable
    // threshold — the reason this operator exists
    val j = Dedup.ngramJaccardPairs(docs, minJaccard = 0.0)
      .filter(col("doc_a") === 1L && col("doc_b") === 2L)
      .select("jaccard").as[Double].collect().head
    assert(j < 0.12, s"jaccard $j should be tiny for a 10x size skew")
  }

  test("paragraphDedup over the newline splitter: corpus-wide " +
      "duplicated paragraphs flagged, boilerplate-heavy doc dropped") {
    import spark.implicits._
    val boiler = "subscribe to our newsletter"
    val legal = "all rights reserved"
    val docs = Seq(
      // doc 1: 3 paragraphs, 2 of them boilerplate shared with others
      (1L, s"$boiler\nunique thought one\n$legal"),
      // doc 2: mostly original, shares one paragraph
      (2L, s"fresh insight a\nfresh insight b\n$legal\nfresh insight c"),
      // doc 3: pure boilerplate — must be dropped
      (3L, s"$boiler\n$legal"),
      // doc 4: fully original; repeated paragraph WITHIN the doc only
      // is not a corpus-wide dup (distinct-doc count = 1)
      (4L, "own words\nown words\nmore own words"),
      // blank/whitespace paragraphs are not paragraphs
      (5L, "   \nsingular text here\n\n  \n")
    ).toDF("doc_id", "text")
    val paras = Dedup.paragraphsOf(docs)
    // splitter: trimmed, non-empty
    assert(paras.filter($"doc_id" === 5L).as[(Long, String)]
      .collect().toSet == Set((5L, "singular text here")))
    val got = Dedup.paragraphDedup(paras, maxDupFrac = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_par"), r.getAs[Long]("n_dup"),
          r.getAs[Boolean]("drop_doc")))).toMap
    assert(got(1L) == ((3L, 2L, true)))
    assert(got(2L) == ((4L, 1L, false)))
    assert(got(3L) == ((2L, 2L, true)))
    assert(got(4L) == ((2L, 0L, false)), "within-doc repeat leaked")
    assert(got(5L) == ((1L, 0L, false)))
  }
}
