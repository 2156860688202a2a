package graft

import graft.ext.TextOps
import graft.functions.RollingHash.rolling_hash
import org.apache.spark.sql.functions._

/** Text-analysis extension surface + the native rolling-hash expression. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("quality features on a hand-computed doc") {
    val d = Seq((1L, "The cat and the dog.")).toDF("doc_id", "text")
    val r = TextOps.qualityFeatures(d).collect().head
    assert(r.getAs[Int]("n_chars") == 20)
    assert(r.getAs[Int]("n_tokens") == 5)
    // tokens: the, cat, and, the, dog. → stopwords: the, and, the = 3/5
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 0.6) < 1e-12)
    // distinct: the, cat, and, dog. → 4/5
    assert(math.abs(r.getAs[Double]("distinct_token_ratio") - 0.8) < 1e-12)
    assert(math.abs(r.getAs[Double]("punct_ratio") - 1.0 / 20) < 1e-12)
  }

  test("repetition stats: hand-computed dup/top n-gram fractions") {
    val d = Seq((1L, "the the the a"), (2L, "x y")).toDF("doc_id", "text")
    val r = TextOps.repetitionStats(d).collect()
      .map(row => row.getAs[Long]("doc_id") -> row).toMap
    val r1 = r(1L)
    // tokens [the,the,the,a]: distinct 2/4 → dup_token_frac 0.5
    assert(r1.getAs[Double]("dup_token_frac") == 0.5)
    // 2-grams: (the the)×2, (the a) → total 3, dup 2, top 2
    assert(r1.getAs[Double]("dup_frac_2") == 0.666667)
    assert(r1.getAs[Double]("top_frac_2") == 0.666667)
    // 3-grams: (the the the), (the the a) → no dups, top 1/2
    assert(r1.getAs[Double]("dup_frac_3") == 0.0)
    assert(r1.getAs[Double]("top_frac_3") == 0.5)
    // 2-token doc: one 2-gram, no 3-grams → null frac_3
    val r2 = r(2L)
    assert(r2.getAs[Double]("top_frac_2") == 1.0)
    assert(r2.isNullAt(r2.fieldIndex("dup_frac_3")))
  }

  test("bpe-ish token count splits words / digits / punctuation") {
    val d = Seq((1L, "hello world42, ok!")).toDF("doc_id", "text")
    val n = d.select(TextOps.bpeishTokenCount($"text")).as[Int]
      .collect().head
    // hello | world | 42 | , | ok | !  = 6
    assert(n == 6)
  }

  test("langId: picks the language with most lexicon hits, und if none") {
    val d = Seq(
      (1L, "the cat and the dog is a pet"),
      (2L, "el perro y la casa de que"),
      (3L, "zzz qqq www")
    ).toDF("doc_id", "text")
    val got = TextOps.langId(d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "es")
    assert(got(3L) == "und")
  }

  test("charNgramLangId: trigram profiles separate languages, und fallback") {
    val d = Seq(
      (1L, "the thing and the others"),
      (2L, "der schein und ich"),
      (3L, "xq"), // shorter than one trigram
      (4L, "zzzzzz")
    ).toDF("doc_id", "text")
    val got = TextOps.charNgramLangId(d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "und")
    assert(got(4L) == "und")
  }

  test("rolling hash: matches the arithmetic, differs across strings") {
    val d = Seq((1L, "ab"), (2L, "ba"), (3L, "ab")).toDF("doc_id", "text")
    val got = d.select($"doc_id", rolling_hash($"text")).as[(Long, Long)]
      .collect().toMap
    // "ab" = 'a'*31 + 'b' = 97*31 + 98 = 3105
    assert(got(1L) == 3105L)
    assert(got(1L) == got(3L))
    assert(got(1L) != got(2L))
  }

  test("contaminationOverlap counts distinct shared n-grams, never doc×doc") {
    val bench = Seq((0L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val train = Seq(
      // contains the benchmark 5-gram "the quick brown fox jumps" twice →
      // distinct ⇒ counted ONCE; plus "fox jumps over the lazy"
      (1L, "the quick brown fox jumps over the lazy cat and " +
        "the quick brown fox jumps again"),
      (2L, "completely unrelated text with no overlap at all whatsoever"),
      (3L, "shorty")) // < 5 tokens → no grams, still emitted with 0
      .toDF("doc_id", "text")
    val got = graft.ext.TextOps.contaminationOverlap(train, bench, n = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getBoolean(2))).toMap
    assert(got(1L)._1 >= 2 && got(1L)._2)
    assert(got(2L) == (0L, false))
    assert(got(3L) == (0L, false))
    // the shared 5-gram appearing twice in doc 1 is counted once
    val expected1 = Seq(
      "the quick brown fox jumps", "quick brown fox jumps over",
      "brown fox jumps over the", "fox jumps over the lazy").size
    assert(got(1L)._1 == expected1)
  }

  test("substringDupWindows flags verbatim 20-token spans, not originals") {
    val span = (1 to 25).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, span),                                  // original
      (1L, "prefix " + span + " suffix"),          // contains it verbatim
      (2L, (100 to 130).map(i => s"u$i").mkString(" ")), // unique text
      (3L, "tiny doc"))                            // < 20 tokens
      .toDF("doc_id", "text")
    val got = graft.ext.Dedup.substringDupWindows(docs, winTokens = 20)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getBoolean(2))).toMap
    // docs 0 and 1 share every 20-window of the 25-token span: doc 0 has
    // 6 windows, all inside doc 1's text too
    assert(got(0L) == (6L, true))
    assert(got(1L)._1 >= 6L && got(1L)._2)
    assert(got(2L) == (0L, false))
    assert(got(3L) == (0L, false)) // too short for any window, still a row
  }

  test("tfidfKeywords ranks rare-but-frequent tokens first") {
    val docs = Seq(
      (0L, "apple apple apple common common"),
      (1L, "banana banana common common common"),
      (2L, "cherry common common"))
      .toDF("doc_id", "text")
    val got = graft.ext.TextOps.tfidfKeywords(docs, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getDouble(3))).toMap
    // 'common' appears in every doc → idf = ln(1) = 0 → never a keyword
    assert(got((0L, 1L))._1 == "apple")
    assert(got((1L, 1L))._1 == "banana")
    assert(got((2L, 1L))._1 == "cherry")
    // tf·ln(N/df): apple 3·ln(3) ≈ 3.295837
    assert(math.abs(got((0L, 1L))._2 - 3 * math.log(3.0)) < 1e-5)
    // rank 2 falls to the zero-idf token (ties by token asc)
    assert(got((0L, 2L))._2 == 0.0)
  }

  test("packSequences: chunk arithmetic and boundary straddles") {
    // one stream, docs of 3,2,4 tokens, seqLen 5, +1 EOS each:
    // starts at 0, 4, 7 → seq ids 0, 0, 1; doc 2 occupies [4..6] (with
    // EOS) but its TOKENS are [4..5] → straddles the 5-boundary
    val d = Seq(("en", 0L, 3L), ("en", 1L, 2L), ("en", 2L, 4L))
      .toDF("lang_pred", "doc_id", "n_tokens")
    val got = graft.ext.TextOps.packSequences(d, seqLen = 5)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(got(0) == (0L, 0L, false)) // tokens [0..2]
    assert(got(1) == (0L, 4L, true))  // tokens [4..5] straddle pos 5
    assert(got(2) == (1L, 2L, true))  // tokens [7..10] straddle pos 10
  }

  test("zipfStats: ranks by frequency and fits the whole-vocab OLS") {
    // freq: a=5 (4 + 1), b=2, c=1 → ranks a=1, b=2, c=3
    val d = Seq((0L, "a a a a b"), (1L, "b c a")).toDF("doc_id", "text")
    val got = graft.ext.TextOps.zipfStats(d, topN = 2)
      .orderBy($"rnk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.length == 2) // topN cuts c even though the fit saw it
    assert(got(0)._1 == "a" && got(0)._2 == 1L && got(0)._3 == 5L)
    assert(got(1)._1 == "b" && got(1)._2 == 2L && got(1)._3 == 2L)
    // closed-form OLS of ln freq on ln rank over ALL THREE points
    val xs = Seq(1.0, 2.0, 3.0).map(math.log)
    val ys = Seq(5.0, 2.0, 1.0).map(math.log)
    val (mx, my) = (xs.sum / 3, ys.sum / 3)
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum / 3
    val vx = xs.map(x => (x - mx) * (x - mx)).sum / 3
    val vy = ys.map(y => (y - my) * (y - my)).sum / 3
    val alpha = cov / vx
    val r2 = cov * cov / (vx * vy)
    assert(math.abs(got(0)._4 - alpha) < 1e-5 && alpha < 0)
    assert(math.abs(got(0)._5 - r2) < 1e-5)
    assert(got(0)._4 == got(1)._4) // every row carries the same fit
  }

  test("sourceMixWeights: uniform target, capped upsampling") {
    // src0: 80 tokens over 2 docs, src1: 20, src2: 2 (cap binds)
    val d = Seq(("src0", 50L), ("src0", 30L), ("src1", 20L), ("src2", 2L))
      .toDF("source", "n_tokens")
    val got = graft.ext.TextOps.sourceMixWeights(d, cap = 5.0)
      .orderBy($"source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // total 102, target share 1/3
    assert(got(0) == (("src0", 2L, 80L,
      math.rint(80.0 / 102 * 1e6) / 1e6,
      math.rint((1.0 / 3) / (80.0 / 102) * 1e6) / 1e6)))
    assert(got(1)._5 == math.rint((1.0 / 3) / (20.0 / 102) * 1e6) / 1e6)
    assert(got(2)._5 == 5.0) // 17× upsample capped at 5
  }

  test("piiScrub counts and masks emails, IPs, phones; order protects IPs") {
    val d = Seq(
      (0L, "mail me at jo.doe+x@test-site.org or visit 10.0.255.1 now"),
      (1L, "call +1 (415) 555-0100 twice"),
      (2L, "nothing sensitive here"),
      (3L, "dial (415) 555-0100 or 415-555-0100 or 415.555.0100"),
      // ordinary numeric prose must NOT be masked (shape-anchored
      // patterns, not "any long digit run")
      (4L, "the war of 1914-1918 ended at 2024-01-01 01:00:00 pi 3.14159265358"),
      // '+'-adjacent numeric prose: the old unbounded intl alternative
      // swallowed this whole run as one <PHONE>
      (5L, "temps +10 (2023) 15.5-20.4 and range +3 100-200 recorded"),
      // octet validation: bogus quad stays, range-valid version string is
      // still masked (documented tradeoff), condensed E.164 is a phone
      (6L, "version 1.2.3.4 ships; 999.999.999.999 is bogus; +442079460958 rings"),
      // spaced international number with separator-delimited groups
      (7L, "reach us at +44 20 7946 0958 today")
    ).toDF("doc_id", "text")
    val got = graft.ext.TextOps.piiScrub(d)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got(0) == ((1L, 1L, 0L,
      "mail me at <EMAIL> or visit <IP> now")))
    assert(got(1)._3 == 1L && got(1)._4 == "call <PHONE> twice")
    assert(got(2) == ((0L, 0L, 0L, "nothing sensitive here")))
    assert(got(3)._3 == 3L &&
      got(3)._4 == "dial <PHONE> or <PHONE> or <PHONE>")
    assert(got(4) == ((0L, 0L, 0L,
      "the war of 1914-1918 ended at 2024-01-01 01:00:00 pi 3.14159265358")))
    assert(got(5) == ((0L, 0L, 0L,
      "temps +10 (2023) 15.5-20.4 and range +3 100-200 recorded")))
    assert(got(6) == ((0L, 1L, 1L,
      "version <IP> ships; 999.999.999.999 is bogus; <PHONE> rings")))
    assert(got(7) == ((0L, 0L, 1L, "reach us at <PHONE> today")))
  }

  test("unigramCrossEntropy: uniform unigram model gives ln(vocab) loss") {
    // counts: a=2, b=2, total=4 → p(a)=p(b)=0.5; every doc's mean token
    // log-loss is exactly ln 2
    val d = Seq((0L, "a a b"), (1L, "b")).toDF("doc_id", "text")
    val got = graft.ext.TextOps.unigramCrossEntropy(d)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ln2 = math.rint(math.log(2.0) * 1e6) / 1e6
    assert(got(0) == ((0L, 3L, ln2)))
    assert(got(1) == ((1L, 1L, ln2)))
  }

  test("gopherFilter: composite flags and overall pass") {
    val d = Seq(
      (0L, "the cat sat on a mat with the dog and a bird today"),
      (1L, "the of a"), // too short
      (2L, "spam spam spam spam spam spam spam spam spam spam go go")
    ).toDF("doc_id", "text")
    val got = graft.ext.TextOps.gopherFilter(d)
      .orderBy($"doc_id").collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(3), r.getBoolean(8),
          r.getBoolean(9))).toMap // (ok_len, ok_stopwords, ok_dup_tok, pass)
    assert(got(0L) == ((true, true, true, true)))
    assert(got(1L)._1 == false && got(1L)._4 == false)
    // repeated-token doc: no stopwords, high dup-token fraction, fails
    assert(got(2L) == ((true, false, false, false)))
  }

  test("perplexityBuckets: equal rank slices, rare-word docs in tail") {
    // corpus frequencies: 'the' dominates, 'zyx'/'qwv' are singletons —
    // docs of common words score low xent (head), rare-word docs high
    val d = Seq(
      (0L, "the the the the"), (1L, "the the the cat"),
      (2L, "the cat the cat"), (3L, "cat dog the cat"),
      (4L, "zyx the dog cat"), (5L, "zyx qwv dog cat")
    ).toDF("doc_id", "text")
    val got = graft.ext.TextOps.perplexityBuckets(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("bucket"), r.getAs[String]("ppl_bucket")))).toMap
    // 6 docs / 3 buckets → exactly 2 per slice
    assert(got.values.map(_._1).groupBy(identity)
      .view.mapValues(_.size).toMap == Map(1L -> 2, 2L -> 2, 3L -> 2))
    assert(got(0L) == ((1L, "head")))   // all-'the' doc is most predictable
    assert(got(5L) == ((3L, "tail")))   // two singletons: least predictable
    assert(got(2L)._2 == "middle" || got(1L)._2 == "middle")
  }

  test("bigramCrossEntropy: hand-checked interpolation, short docs drop") {
    // corpus "a b" + "a c" + "solo": bigrams (a,b),(a,c) → c(a,·)=2,
    // each cb=1 → p_bi=0.5; unigrams a:2,b:1,c:1,solo:1 of 5 →
    // p_uni(b)=p_uni(c)=0.2; p̂ = 0.7·0.5 + 0.3·0.2, both docs −ln p̂
    val d = Seq((1L, "a b"), (2L, "a c"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = graft.ext.TextOps.bigramCrossEntropy(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("xent_bi")))).toMap
    val expect = BigDecimal(-math.log(0.7 * 0.5 + 0.3 * 0.2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((1L, expect)))
    assert(got(2L) == ((1L, expect)))
    assert(!got.contains(3L))   // single-token doc: no bigrams
  }

  test("bigramCrossEntropy ranks scrambled text above natural order") {
    // six docs share one phrase; the scrambled twin reuses the SAME
    // words (identical unigram profile) in an order the corpus never
    // repeats → bigram xent must separate them where unigram can't
    val phrase = "the cat sat on the mat"
    val d = Seq(
      (1L, phrase), (2L, phrase), (3L, phrase), (4L, phrase),
      (5L, "mat the on sat cat the")
    ).toDF("doc_id", "text")
    val bi = graft.ext.TextOps.bigramCrossEntropy(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("xent_bi")).toMap
    assert(bi(5L) > bi(1L), s"scrambled should score worse: $bi")
    val uni = graft.ext.TextOps.unigramCrossEntropy(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("xent")).toMap
    assert(uni(5L) == uni(1L))  // unigram is blind to the scramble
  }

  test("importanceWeights: add-one smoothed log-ratio, hand-checked") {
    // raw corpus: {a:2, b:2}, total 4; target: {a:1}, total 1; union
    // vocab v=2. p_tgt(a)=2/3, p_raw(a)=3/6 → logw(doc1)=ln(4/3);
    // p_tgt(b)=1/3, p_raw(b)=3/6 → logw(doc2)=ln(2/3).
    val raw = Seq((1L, "a a"), (2L, "b b")).toDF("doc_id", "text")
    val tgt = Seq((9L, "a")).toDF("doc_id", "text")
    val got = graft.ext.TextOps.importanceWeights(raw, tgt).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("logw")))).toMap
    assert(got(1L) == ((2L, 0.287682)))   // ln(4/3) rounded at 6
    assert(got(2L) == ((2L, -0.405465)))  // ln(2/3): target-unlike < 0
  }

  test("rolling hash is null-safe") {
    val d = Seq((1L, Option("x")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val got = d.select(rolling_hash($"text")).collect()
    assert(got(1).isNullAt(0))
  }

  test("ngramNovelty: first occurrence owns the gram, later docs lose it") {
    val d = Seq(
      (1L, "a b c d"),        // grams: "a b c","b c d" — both novel
      (2L, "a b c x"),        // "a b c" seen at 1; "b c x" novel
      (3L, "a b c d"),        // verbatim copy — zero novelty
      (4L, "z z")             // < 3 tokens: no grams, drops
    ).toDF("doc_id", "text")
    val got = graft.ext.TextOps.ngramNovelty(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_distinct"), r.getAs[Long]("n_novel"),
          r.getAs[Double]("novelty")))).toMap
    assert(got(1L) == ((2L, 2L, 1.0)))
    assert(got(2L) == ((2L, 1L, 0.5)))
    assert(got(3L) == ((2L, 0L, 0.0)))
    assert(!got.contains(4L))
  }
}
