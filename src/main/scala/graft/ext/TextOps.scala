package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table (north-star extension surface, SURVEY §7.5):
  * tokenization, token counting, quality scoring, language
  * identification, fingerprinting. All pure column expressions
  * (codegen'd, no UDFs) so they run at scan speed on 100 TB of text.
  */
object TextOps {

  /** Whitespace tokenizer (lowercased). */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Word n-grams of the token stream, NON-distinct (every occurrence,
    * in order) — the multiset the repetition statistics count over.
    * Short docs (< n tokens) get an empty list, guarding Spark's
    * descending `sequence(0, negative)`.
    */
  def wordNgrams(text: Column, n: Int): Column = {
    val toks = tokens(text)
    // n-grams as a fold of zip_with over the (n−1) shifted copies of the
    // token array: every array ARGUMENT of a higher-order function is
    // evaluated once per row, so the text is split ~2n times total. The
    // obvious transform-over-indices form (slice(toks, i+1, n) inside the
    // lambda) instead re-evaluates the split per OUTPUT ELEMENT — the
    // whole text re-tokenized ~L times per doc, which made shingle
    // materialization the hottest loop of the dedup family (measured 50×
    // on a 200k-doc corpus: 24 s → 0.5 s for the exploded shingle scan).
    // zip_with pads the shorter side with null and concat propagates it,
    // so positions past L−n+1 come out null and one filter trims them —
    // same strings, same order, same empty-when-short contract.
    val shifted = (1 until n).map(i => slice(toks, lit(i + 1), size(toks)))
    val joined = shifted.foldLeft(toks)((acc, arr) =>
      zip_with(acc, arr, (a, b) => concat(a, lit(" "), b)))
    when(size(toks) >= n, filter(joined, x => x.isNotNull))
      .otherwise(array().cast("array<string>"))
  }

  /** Gopher-rules composite document filter (Rae et al. 2021 §A1.1, the
    * representative subset expressible over this engine's signals): token
    * count bounds, mean token length bounds, minimum stopword count, and
    * the repetition thresholds over [[repetitionStats]]' fractions.
    * Every continuous signal is ROUNDED to 6 decimals before its
    * threshold comparison — the comparison then happens on values both
    * engines agree on bit-for-bit, so the boolean flags are
    * oracle-exact (see q74). Docs too short to have n-grams pass the
    * n-gram rules vacuously (null → ok, mirrored in SQL).
    *
    * Output: (doc_id, ok_len, ok_mean_tok, ok_stopwords, ok_dup2,
    * ok_top2, ok_dup3, ok_top3, ok_dup_tok, pass).
    */
  def gopherFilter(docs: DataFrame, textCol: String = "text",
                   minTokens: Long = 10, maxTokens: Long = 100000,
                   minMeanTok: Double = 2.0, maxMeanTok: Double = 12.0,
                   minStop: Long = 2, maxDup2: Double = 0.2,
                   maxTop2: Double = 0.3, maxDup3: Double = 0.18,
                   maxTop3: Double = 0.25,
                   maxDupTok: Double = 0.6): DataFrame = {
    val stopArr = array(stopwords.map(lit): _*)
    val base = docs.select(col("doc_id"),
        explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(length(col("tok"))), 6).as("mean_tok_len"),
        sum(when(array_contains(stopArr, col("tok")), 1L).otherwise(0L))
          .as("n_stop"))
    val flags = base.join(repetitionStats(docs, textCol), "doc_id")
      .select(col("doc_id"),
        (col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
          .as("ok_len"),
        (col("mean_tok_len") >= minMeanTok &&
          col("mean_tok_len") <= maxMeanTok).as("ok_mean_tok"),
        (col("n_stop") >= minStop).as("ok_stopwords"),
        coalesce(col("dup_frac_2") <= maxDup2, lit(true)).as("ok_dup2"),
        coalesce(col("top_frac_2") <= maxTop2, lit(true)).as("ok_top2"),
        coalesce(col("dup_frac_3") <= maxDup3, lit(true)).as("ok_dup3"),
        coalesce(col("top_frac_3") <= maxTop3, lit(true)).as("ok_top3"),
        (col("dup_token_frac") <= maxDupTok).as("ok_dup_tok"))
    flags.withColumn("pass",
      Seq("ok_len", "ok_mean_tok", "ok_stopwords", "ok_dup2", "ok_top2",
        "ok_dup3", "ok_top3", "ok_dup_tok").map(col).reduce(_ && _))
  }

  /** Unigram LM cross-entropy per document — the LM-based quality filter
    * of CCNet/CC-style pipelines reduced to its SQL-expressible core: a
    * unigram model p(t) = count(t)/total is "trained" in one aggregation
    * over the corpus, and each document scores
    * xent = −Σ_t n_t·ln p(t) / n_tokens (mean token log-loss; gibberish
    * and rare-token soup score high, natural repetition of the corpus's
    * own distribution scores low). No OOV handling needed: the model and
    * the scored docs are the same corpus.
    *
    * Scale shape: token explode + per-(doc, term) counts (map-side
    * combined), one corpus-wide frequency table, an equi-join on term
    * (AQE broadcasts it while vocab is small; at web-corpus vocab it
    * shuffle-joins on the term key), one per-doc aggregation. The per-doc
    * Σ runs over the doc's DISTINCT terms (counts pre-aggregated), so
    * double-sum ordering noise stays ULP-scale — rounded away at 6
    * decimals like every double the oracles compare.
    *
    * Output: (doc_id, n_tokens, xent).
    *
    * Cache lifetime: the per-(doc, term) table is persisted because it
    * feeds both the vocab aggregation and the scoring join of the SAME
    * returned plan; the handle is internal, so it lives until evicted
    * (MEMORY_AND_DISK is LRU-evictable) or the session ends. A caller
    * invoking this repeatedly in one long session should materialize the
    * result and `spark.catalog.clearCache()` between rounds.
    */
  def unigramCrossEntropy(docs: DataFrame,
                          textCol: String = "text"): DataFrame = {
    val docTerm = docs.select(col("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("n_t"))
      .transform(graft.util.Pins.pin)
    val vocab = docTerm.groupBy(col("term"))
      .agg(sum(col("n_t")).as("freq"))
    val total = vocab.agg(sum(col("freq")).as("total"))
    val scored = docTerm.join(vocab, "term")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_t")).as("n_tokens"),
        (-sum(col("n_t") *
          log(col("freq").cast("double") / col("total"))) /
          sum(col("n_t"))).as("xent"))
    scored.select(col("doc_id"), col("n_tokens"),
      round(col("xent"), 6).as("xent"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): rank
    * every document by its LM score — here [[unigramCrossEntropy]], the
    * engine's SQL-expressible stand-in for the paper's KenLM perplexity
    * — and split the corpus into `nBuckets` equal rank slices:
    * head (best-scoring third), middle, tail. Pipelines then keep head,
    * sample middle, drop tail.
    *
    * The global rank is [[graft.ops.GraphOps.withPosition]] — range
    * repartition + per-partition sort + zipWithIndex, a distributed
    * total order, never a single-task unpartitioned window. Ties break
    * on doc_id so the rank (and hence bucket edges) is deterministic in
    * both engines. Bucket arithmetic is `1 + floor(nBuckets·pos/n)` on
    * exact integers (< 2⁵³, quotient ≥ 1/n from any integer), so the
    * floor is engine-exact — no percentile estimation involved.
    *
    * Output: (doc_id, xent, bucket, ppl_bucket).
    */
  def perplexityBuckets(docs: DataFrame, textCol: String = "text",
                        nBuckets: Int = 3): DataFrame =
    perplexityBucketsFrom(unigramCrossEntropy(docs, textCol), nBuckets)

  /** [[perplexityBuckets]] over an already-computed
    * [[unigramCrossEntropy]] table — lets a session that also serves the
    * raw scores (q73) pay the LM scoring once (round 15).
    */
  def perplexityBucketsFrom(scored: DataFrame,
                            nBuckets: Int = 3): DataFrame = {
    // n is the rank's own offsets total — the previous draft re-counted
    // `scored` and broadcast-cross-joined the count row (one extra job)
    val (ranked, n) = graft.ops.GraphOps.withPositionCounted(
      scored.select(col("doc_id"), col("xent")), "pos",
      col("xent").asc, col("doc_id").asc)
    ranked
      .select(col("doc_id"), col("xent"),
        (floor(col("pos").cast("double") * nBuckets / lit(n)) + 1L)
          .cast("long").as("bucket"))
      .withColumn("ppl_bucket",
        when(col("bucket") === 1, "head")
          .when(col("bucket") === nBuckets, "tail")
          .otherwise("middle"))
  }

  /** Interpolated bigram LM cross-entropy — one rung up the LM ladder
    * from [[unigramCrossEntropy]] (the Jelinek-Mercer member of the
    * KenLM-style smoothed n-gram family, at the order SQL mirrors can
    * still check exactly): per bigram token,
    * `p̂(t|prev) = λ·c(prev,t)/c(prev,·) + (1−λ)·p_uni(t)`, and the doc
    * scores the mean −ln p̂ over its bigrams. Catches word-salad that
    * unigram scoring misses: plausible words in implausible order.
    *
    * Scale shape: positions come from one `posexplode`; the previous
    * token is a per-document `lag` window (partitioned by doc — a
    * partition is one document, never the corpus); corpus bigram and
    * context tables are map-side-combined aggs keyed by the bigram, and
    * the scoring join is equi on (prev, term). The per-doc Σ runs over
    * DISTINCT bigram types with pre-aggregated counts, rounded at 6 —
    * the q73 determinism discipline. Docs with fewer than 2 tokens have
    * no bigrams and drop from the output (documented; the unigram score
    * covers them).
    *
    * Output: (doc_id, n_bigrams, xent_bi).
    *
    * Cache lifetime: the per-(doc, prev, term) table persists because
    * it feeds both corpus aggregations and the scoring join of the SAME
    * returned plan — the [[unigramCrossEntropy]] convention (LRU-
    * evictable; long-lived sessions should materialize + clearCache).
    */
  def bigramCrossEntropy(docs: DataFrame, textCol: String = "text",
                         lambda: Double = 0.7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pt = docs.select(col("doc_id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "term")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bc = pt.withColumn("prev", lag(col("term"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("doc_id"), col("prev"), col("term"))
      .agg(count(lit(1)).as("n_bt"))
      .transform(graft.util.Pins.pin)
    val cbi = bc.groupBy(col("prev"), col("term"))
      .agg(sum(col("n_bt")).as("cb"))
    val cctx = cbi.groupBy(col("prev")).agg(sum(col("cb")).as("cc"))
    val uni = docs.select(explode(tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
    val tot = uni.agg(sum(col("freq")).as("total"))
    bc.join(cbi, Seq("prev", "term")).join(cctx, Seq("prev"))
      .join(uni, Seq("term")).crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_bt")).as("n_bigrams"),
        (-sum(col("n_bt") * log(
          lit(lambda) * (col("cb").cast("double") / col("cc")) +
            lit(1.0 - lambda) *
              (col("freq").cast("double") / col("total")))) /
          sum(col("n_bt"))).as("xent_bi"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("xent_bi"), 6).as("xent_bi"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling", reduced to its
    * unigram core): score every raw-corpus document by the
    * log-likelihood ratio between a TARGET-domain unigram LM and the
    * raw-corpus unigram LM,
    * `logw = Σ_t n_t·(ln p_tgt(t) − ln p_raw(t)) / n_tokens`.
    * Docs that look like the target domain get positive weight;
    * pipelines then resample the raw pool ∝ exp(logw) (or keep top-w)
    * to tilt a web-scale corpus toward a small high-quality exemplar
    * set. Both LMs are add-one smoothed over the UNION vocabulary, so
    * target-OOV terms are defined and the ratio stays finite.
    *
    * Scale shape: the paper's hashed-n-gram trick exists to bound the
    * feature space; unigrams over a term-keyed shuffle join don't need
    * it — two corpus-wide frequency tables (map-side combined), one
    * equi-join on term against the doc's DISTINCT-term counts, one
    * per-doc aggregation. The target table is the SMALL side by
    * construction (an exemplar set), so its frequency table broadcasts;
    * the raw side joins on the term key. Per-doc Σ runs over distinct
    * terms with pre-aggregated counts, then rounds at 6 decimals —
    * the q73 double-sum discipline.
    *
    * Output: (doc_id, n_tokens, logw).
    */
  def importanceWeights(docs: DataFrame, target: DataFrame,
                        textCol: String = "text"): DataFrame = {
    def termCounts(d: DataFrame) = d
      .select(explode(tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
    val docTerm = docs.select(col("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("n_t"))
    // corpus term frequency folds from the per-doc counts (identical
    // sums) instead of re-tokenizing the corpus: both branches share
    // docTerm's exchange (ReuseExchange), so the explode runs once
    val rawF = docTerm.groupBy(col("term"))
      .agg(sum(col("n_t")).as("freq"))
    val tgtF = termCounts(target)
    // union-vocab size + both totals in ONE broadcast row: |V| rides the
    // plan, never a driver-side .count()
    val consts = rawF.join(tgtF.withColumnRenamed("freq", "tfreq"),
        Seq("term"), "full_outer")
      .agg(count(lit(1)).as("v"),
        sum(coalesce(col("freq"), lit(0L))).as("raw_total"),
        sum(coalesce(col("tfreq"), lit(0L))).as("tgt_total"))
    docTerm.join(rawF, "term")
      .join(broadcast(tgtF.withColumnRenamed("freq", "tfreq")),
        Seq("term"), "left")
      .crossJoin(broadcast(consts))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_t")).as("n_tokens"),
        (sum(col("n_t") *
          (log((coalesce(col("tfreq"), lit(0L)) + lit(1L)).cast("double") /
             (col("tgt_total") + col("v"))) -
           log((col("freq") + lit(1L)).cast("double") /
             (col("raw_total") + col("v"))))) /
          sum(col("n_t"))).as("logw"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("logw"), 6).as("logw"))
  }

  /** Zipf vocabulary statistics: corpus-wide term frequencies, frequency
    * rank, and the Zipf exponent — the standard corpus-health diagnostic
    * for a training set (natural language follows freq ∝ rank^(−α) with
    * α ≈ 1; machine-generated or template text bends the curve). Emits
    * the `topN` most frequent terms, each row carrying the whole-vocab
    * fit (α = OLS slope of ln freq on ln rank, R² = corr²) — the
    * closed-form one-pass regression discipline of
    * [[graft.ops.Scoring.powerlawFit]].
    *
    * Scale shape: term frequency is one explode + hash-aggregation
    * (map-side combined, linear in corpus tokens); the rank is the
    * range-partitioned distributed zipWithIndex of
    * [[graft.ops.GraphOps.withPosition]] — NOT a single-partition global
    * window — because a 100 TB corpus's vocabulary (hundreds of millions
    * of terms with subwords/typos) must rank without ever collecting to
    * one task; the fit is one aggregation over the ranked vocab.
    *
    * Cache lifetime: the ranked vocab rides [[GraphOps.withPosition]]'s
    * own localCheckpoint materialization; both consumers (fit + top-N)
    * reread those blocks directly (round 16 — the previous extra pin
    * duplicated the materialization).
    */
  def zipfStats(docs: DataFrame, topN: Int = 50,
                textCol: String = "text"): DataFrame = {
    val tf = docs.select(explode(tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
    // no pin (round 16): withPosition's ranked table is already a
    // materialized localCheckpoint leaf; both consumers (fit + top-N)
    // re-apply only the cheap offsets-map projection over those blocks,
    // so a second persisted copy bought nothing but an extra
    // materialization pass
    val rk = graft.ops.GraphOps.withPosition(tf, "pos",
        col("freq").desc, col("term").asc)
      .withColumn("rnk", col("pos") + 1L).drop("pos")
    val fit = rk.agg(
      (covar_pop(log(col("rnk")), log(col("freq"))) /
        var_pop(log(col("rnk")))).as("alpha"),
      pow(corr(log(col("rnk")), log(col("freq"))), 2).as("r2"))
    rk.filter(col("rnk") <= topN)
      .crossJoin(broadcast(fit))
      .select(col("term"), col("rnk"), col("freq"),
        round(col("alpha"), 6).as("alpha"), round(col("r2"), 6).as("r2"))
  }

  /** PII scrubbing patterns — deliberately restricted to syntax with
    * IDENTICAL semantics in Java regex (Spark) and RE2 (DuckDB): plain
    * character classes, bounded repetition, `\b` word boundaries; no
    * lookaround, no backreferences. Tight enough to be oracle-mirrored,
    * real enough to catch the standard e-mail / IPv4 / phone shapes.
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  // octets range-validated (0-255, no leading-zero forms) so arbitrary
  // dotted numerics ("999.999.999.999", section numbers) are not masked.
  // A range-valid dotted quad that is actually a software version
  // ("1.2.3.4") is still masked — indistinguishable without context;
  // that residual over-masking is the accepted tradeoff.
  private val octet = "(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])"
  val ipv4Re =
    s"\\b$octet\\.$octet\\.$octet\\.$octet\\b"
  // four concrete phone SHAPES rather than "any long digit run": an
  // international +CC number with separator-delimited groups, a
  // condensed E.164 run (+ and 7-15 digits), a parenthesized-area-code
  // number, and a dashed/dotted 3-3-4 triplet. A generic
  // [0-9 ().-]{5,} run also matches year ranges ("1914-1918"),
  // timestamps, decimals, and — when '+'-prefixed — entire stretches of
  // numeric prose ("temps +10 (2023) 15.5-20.4"); the scrub runs inside
  // the curate pipeline, where masking a date corrupts training text.
  // Every group below is bounded, so no alternative can swallow an
  // unbounded digit/space run.
  val phoneRe =
    "\\+[0-9]{1,3}[ .-]?" +
      "(\\([0-9]{2,4}\\)[ .-]?|[0-9]{2,4}[ .-])?" +
      "[0-9]{3,4}[ .-][0-9]{4}\\b" +
    "|\\+[0-9]{7,15}\\b" +
    "|\\([0-9]{3}\\) ?[0-9]{3}[ .-][0-9]{4}" +
    "|\\b[0-9]{3}[.-][0-9]{3}[.-][0-9]{4}\\b"

  /** PII scrubbing — the redaction pass an LLM data pipeline runs before
    * training: count and mask e-mail addresses, IPv4 addresses, and
    * phone-number-shaped digit runs. One codegen projection over the
    * corpus (three regexp_extract_all counts + three chained
    * regexp_replace), no shuffle — scan-speed at any corpus size.
    * Replacement order (e-mail → IP → phone) is part of the contract:
    * the phone pattern would otherwise eat IP octets. Both engines
    * replace leftmost-first non-overlapping, so redacted text is
    * engine-portable (see the q72 oracle).
    *
    * Output: (doc_id, n_emails, n_ipv4, n_phones, clean_text).
    */
  def piiScrub(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    // each count runs on the PREVIOUS stage's masked text, so a category
    // never re-counts what an earlier mask consumed (an IPv4's digit run
    // would otherwise also match the phone shape)
    val afterEmail = regexp_replace(t, emailRe, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, ipv4Re, "<IP>")
    docs.select(col("doc_id"),
      size(regexp_extract_all(t, lit(emailRe), lit(0))).cast("bigint")
        .as("n_emails"),
      size(regexp_extract_all(afterEmail, lit(ipv4Re), lit(0)))
        .cast("bigint").as("n_ipv4"),
      size(regexp_extract_all(afterIp, lit(phoneRe), lit(0)))
        .cast("bigint").as("n_phones"),
      regexp_replace(afterIp, phoneRe, "<PHONE>").as("clean_text"))
  }

  /** Source-mix balancing weights — the data-mixing step of an LLM
    * training pipeline: given one row per document with its ingestion
    * `source` and token count, compute each source's token share and the
    * sampling weight that rebalances the mix toward a uniform
    * target share (weight = target/actual, capped at `cap` so a
    * near-empty source can't be upsampled unboundedly — the standard
    * guard in published mixture tuning). Two tiny aggregations (sources ≪
    * docs); the per-source table then drives weighted sampling upstream.
    *
    * Output: (source, n_docs, n_tokens, token_share, mix_weight).
    */
  def sourceMixWeights(docSource: DataFrame, cap: Double = 5.0): DataFrame = {
    val src = docSource.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    // grand totals via an unpartitioned window over the per-source
    // aggregate — NOT a crossJoin(agg) that re-evaluates the upstream
    // scan a second time. The single-partition collapse is exactly right
    // here because sources ≪ docs by definition (contrast
    // unigramCrossEntropy, where vocab is corpus-scale and the
    // crossJoin-of-agg tree shape is the correct one).
    val w = org.apache.spark.sql.expressions.Window.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    src.withColumn("total", sum(col("n_tokens")).over(w))
      .withColumn("n_sources", count(lit(1)).over(w))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("total"), 6)
          .as("token_share"),
        round(least(lit(cap), (lit(1.0) / col("n_sources")) /
          (col("n_tokens").cast("double") / col("total"))), 6)
          .as("mix_weight"))
  }

  /** Repetition statistics — the Gopher-style repetition quality signals
    * (Rae et al. 2021 §A1.1: fraction of duplicated n-grams, fraction in
    * the most frequent n-gram, duplicate-token fraction). Filtering on
    * these is the standard "remove degenerate/boilerplate text" pass of
    * an LLM data pipeline.
    *
    * Per doc: dup_frac_n = occurrences belonging to n-grams seen more
    * than once / total n-grams (n ∈ {2,3}); top_frac_n = max n-gram
    * count / total; dup_token_frac = 1 − distinct/total tokens. The
    * shuffle is keyed on (doc_id, gram) with map-side combine — linear
    * in corpus size, no doc-level skew beyond document length itself.
    */
  def repetitionStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    def gramStats(n: Int): DataFrame =
      docs.select(col("doc_id"),
          explode(wordNgrams(col(textCol), n)).as("g"))
        .groupBy(col("doc_id"), col("g"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"))
        .agg(
          round(try_divide(sum(when(col("cnt") > 1, col("cnt"))
            .otherwise(0L)).cast("double"), sum(col("cnt"))), 6)
            .as(s"dup_frac_$n"),
          round(try_divide(max(col("cnt")).cast("double"),
            sum(col("cnt"))), 6).as(s"top_frac_$n"))
    val tokStats = docs.select(col("doc_id"),
        explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("doc_id"))
      .agg(round(lit(1.0) - try_divide(
        count_distinct(col("tok")).cast("double"), count(lit(1))), 6)
        .as("dup_token_frac"))
    tokStats.join(gramStats(2), Seq("doc_id"), "left")
      .join(gramStats(3), Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_token_frac"), col("dup_frac_2"),
        col("top_frac_2"), col("dup_frac_3"), col("top_frac_3"))
  }

  /** BPE-ish subword count: word tokens + digit runs + punctuation are
    * separate tokens, approximating a byte-pair-encoding tokenizer's
    * granularity without a vocab: count of maximal runs of
    * [letters | digits | single punct].
    */
  def bpeishTokenCount(text: Column): Column =
    size(filter(
      split(text, "(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])" +
        "|(?<=[A-Za-z])(?=[0-9])|(?<=[0-9])(?=[A-Za-z])"),
      t => t =!= "" && t =!= " "))

  /** Quality features: length, token stats, punctuation/stopword/digit
    * ratios — the standard cheap text-quality heuristics.
    */
  val stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of",
    "to", "in", "is", "it", "that", "for", "on", "with", "as")

  def qualityFeatures(docs: DataFrame,
                      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nTok = size(toks)
    val stopArr = array(stopwords.map(lit): _*)
    docs.select(
      col("doc_id") +: Seq(
        length(t).as("n_chars"),
        nTok.as("n_tokens"),
        (length(t).cast("double") / nTok).as("mean_token_len"),
        (size(filter(toks, tk => array_contains(stopArr, tk))).cast("double")
          / nTok).as("stopword_ratio"),
        (length(regexp_replace(t, "[^.,;:!?]", "")).cast("double") /
          length(t)).as("punct_ratio"),
        (length(regexp_replace(t, "[^0-9]", "")).cast("double") /
          length(t)).as("digit_ratio"),
        (size(array_distinct(toks)).cast("double") / nTok)
          .as("distinct_token_ratio")): _*)
  }

  /** Feature names of [[distillFeatures]], in weight-index order
    * (intercept first in the fitted array, then these).
    */
  val distillFeatCols: Seq[String] = Seq("f_stop", "f_distinct", "f_mtl")

  /** Training frame for the distilled quality classifier (q85): the
    * quality ratios rounded to 6dp — the q17 oracle proves 6dp parity
    * engine-to-engine, so everything downstream of the rounding is exact
    * arithmetic on identical doubles — plus the teacher label `is_hq`:
    * the [[qualityScore]] composite rule re-evaluated ON the rounded
    * features at threshold 0.55 (pure +/·/min/max on identical doubles,
    * so the verdict is bit-identical in any engine). The student sees
    * only the ratios that vary in this corpus; the teacher still
    * evaluates the full rule.
    */
  def distillFeatures(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val f = qualityFeatures(docs, textCol)
      .select(col("doc_id"),
        round(col("stopword_ratio"), 6).as("f_stop"),
        round(col("digit_ratio"), 6).as("f_digit"),
        round(col("distinct_token_ratio"), 6).as("f_distinct"),
        round(col("mean_token_len"), 6).as("f_mtl"))
    val teacher =
      lit(0.4) * least(col("f_stop") * 4.0, lit(1.0)) +
        lit(0.3) * col("f_distinct") +
        lit(0.3) * (lit(1.0) - least(col("f_digit") * 5.0, lit(1.0)))
    f.select(col("doc_id"), (teacher >= 0.55).as("is_hq"),
      col("f_stop"), col("f_distinct"), col("f_mtl"))
  }

  /** Composite quality score in [0,1]: high stopword share, moderate token
    * length, low digit/punct noise. Deterministic arithmetic.
    */
  def qualityScore(docs: DataFrame, textCol: String = "text"): DataFrame =
    qualityFeatures(docs, textCol).select(
      col("doc_id"),
      least(lit(1.0), greatest(lit(0.0),
        lit(0.4) * least(col("stopword_ratio") * 4.0, lit(1.0)) +
        lit(0.3) * col("distinct_token_ratio") +
        lit(0.3) * (lit(1.0) - least(col("digit_ratio") * 5.0, lit(1.0)))))
        .as("quality_score"))

  /** Tiny per-language lexicons for the n-gram/stopword language-ID
    * heuristic. Deliberately small — language ID at pipeline scale is a
    * lexicon-hit-count argmax, which is a broadcast join + count, not a
    * model inference.
    */
  val langLexicon: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "and", "en" -> "of", "en" -> "is",
    "en" -> "a", "en" -> "to", "en" -> "row", "en" -> "value",
    "es" -> "el", "es" -> "la", "es" -> "de", "es" -> "que",
    "es" -> "y", "es" -> "los",
    "de" -> "der", "de" -> "die", "de" -> "und", "de" -> "das",
    "de" -> "ist", "de" -> "ein",
    "fr" -> "le", "fr" -> "la", "fr" -> "et", "fr" -> "les",
    "fr" -> "des", "fr" -> "est")

  /** Distinctive character trigrams per language for the n-gram
    * language-ID heuristic (the classic Cavnar–Trenkle shape, profile
    * truncated to a handful of high-frequency trigrams per language).
    */
  val langTrigrams: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> " th", "en" -> "ing", "en" -> "and",
    "en" -> " of", "en" -> "ed ",
    "es" -> " de", "es" -> "os ", "es" -> "ión", "es" -> " la",
    "es" -> "que", "es" -> "ado",
    "de" -> "der", "de" -> "sch", "de" -> "ein", "de" -> "ich",
    "de" -> "und", "de" -> "en ",
    "fr" -> " le", "fr" -> "es ", "fr" -> "ent", "fr" -> "ais",
    "fr" -> "eur", "fr" -> " ét")

  /** Character-n-gram language ID: slide a 3-char window over the
    * lowered text (explode of a substring sequence — no UDF), broadcast-
    * join the trigram profiles, count hits per language, argmax (ties:
    * lexicographically smallest; no hits: 'und'). Same shuffle shape as
    * the lexicon variant; the n-gram profile is robust to unseen words.
    */
  def charNgramLangId(docs: DataFrame, textCol: String = "text")
      : DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val prof = broadcast(langTrigrams.toDF("lex_lang", "tri"))
    val tris = docs.select(col("doc_id"), lower(col(textCol)).as("t"))
      .filter(length(col("t")) >= 3)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), length(col("t")) - 2),
        i => col("t").substr(i, lit(3)))).as("tri"))
    val hits = tris.join(prof, "tri")
      .groupBy(col("doc_id"), col("lex_lang"))
      .agg(count(lit(1)).as("hits"))
    val best = hits.groupBy(col("doc_id"))
      .agg(max(col("hits")).as("max_hits"))
    val pred = hits.join(best, "doc_id")
      .filter(col("hits") === col("max_hits"))
      .groupBy(col("doc_id"))
      .agg(min(col("lex_lang")).as("lang_pred"))
    docs.select(col("doc_id"))
      .join(pred, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("lang_pred"), lit("und"))
        .as("lang_pred"))
  }

  /** tf-idf keyword extraction: per doc, the top-k tokens by
    * tf·ln(N/df). Corpus stats are two aggregations (term frequency per
    * (doc, token); document frequency per token); N rides the plan as a
    * broadcast 1-row crossJoin, not a driver scalar. Ranking uses the
    * ROUNDED score (deterministic cross-engine ordering — raw doubles
    * could differ by an ulp between ln implementations), ties broken by
    * token, so the top-k set is stable and oracle-checkable.
    */
  def tfidfKeywords(docs: DataFrame, k: Int = 3,
                    textCol: String = "text"): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(tokens(col(textCol))).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    // tf holds exactly one row per distinct (doc, token), so document
    // frequency folds from it (ReuseExchange shares tf's shuffle)
    // instead of re-tokenizing the corpus for a distinct + second agg
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val nDocs = broadcast(docs.agg(count(lit(1)).as("n_docs")))
    val scored = tf.join(dfreq, "tok").crossJoin(nDocs)
      .withColumn("tfidf", round(col("tf") *
        log(col("n_docs").cast("double") / col("df").cast("double")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("tok").asc)
    scored.withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("tok"), col("tfidf"))
  }

  /** Benchmark-contamination check — the decontamination pass of an LLM
    * data pipeline (train/test n-gram overlap, the GPT-3 appendix-C /
    * Gopher §A.2 shape): for each candidate training doc, the count of
    * DISTINCT word n-grams it shares with ANY benchmark doc. The join is
    * an inverted index keyed by the n-gram (one shuffle, linear in corpus
    * n-gram volume, map-side distinct) — never doc × doc; the benchmark
    * side collapses to its distinct gram set first, so a gram shared by
    * many benchmark docs costs one row.
    */
  def contaminationOverlap(train: DataFrame, bench: DataFrame, n: Int = 5,
                           textCol: String = "text"): DataFrame = {
    def grams(df: DataFrame) = df.select(col("doc_id"),
      explode(array_distinct(wordNgrams(col(textCol), n))).as("g"))
    val bg = grams(bench).select(col("g")).distinct()
    val hits = grams(train).join(bg, "g")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared_ngrams"))
    train.select(col("doc_id")).join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared_ngrams"), lit(0L)).as("n_shared_ngrams"),
        (coalesce(col("n_shared_ngrams"), lit(0L)) > 0).as("contaminated"))
  }

  /** Corpus n-gram novelty — the diversity/redundancy signal a training
    * pipeline tracks per document ("how much of this doc's surface form
    * is NEW versus already in the corpus"): for each doc, the fraction
    * of its DISTINCT word n-grams whose first corpus occurrence (min
    * doc_id) is this doc. High-novelty docs expand coverage; near-zero
    * novelty marks paraphrase mass that per-pair near-dup filters can
    * miss (no single pair is similar, every phrase is recycled).
    *
    * Distributed shape — no join back to the gram table: a gram's
    * novelty belongs to exactly ONE doc (its min), so `n_novel` per doc
    * is just a count over the first-occurrence table, and `n_distinct`
    * is a doc-keyed count of the exploded grams (rows of one doc never
    * leave their partition — the partial agg collapses before any
    * shuffle). The single wide shuffle is the gram-keyed min, and it
    * rides a 60-bit md5-derived BIGINT key instead of gram strings —
    * fixed 8-byte shuffle rows, engine-portable (the q83 oracle builds
    * the identical key), collision odds ~g²/2⁶¹ and deterministic in
    * both engines when they do occur. Docs with < n tokens have no
    * grams and drop (inner semantics, mirrored in the oracle).
    *
    * Output: (doc_id, n_distinct, n_novel, novelty).
    */
  def ngramNovelty(docs: DataFrame, textCol: String = "text",
                   n: Int = 3): DataFrame = {
    // pinned: the hashed gram table feeds BOTH the per-doc distinct
    // counts and the first-occurrence index; unpinned, each consumer
    // re-tokenizes and re-hashes the corpus (the minhashLshPairs
    // multi-consumer persist discipline)
    val grams = docs.select(col("doc_id"),
        explode(array_distinct(wordNgrams(col(textCol), n))).as("g"))
      .select(col("doc_id"),
        conv(substring(md5(col("g")), 1, 15), 16, 10).cast("bigint")
          .as("gk"))
      .transform(graft.util.Pins.pin)
    val nDistinct = grams.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_distinct"))
    val nNovel = grams.groupBy(col("gk"))
      .agg(min(col("doc_id")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_novel"))
    nDistinct.join(nNovel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_distinct"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        round(coalesce(col("n_novel"), lit(0L)).cast("double") /
          col("n_distinct"), 6).as("novelty"))
  }

  /** Per-language token-budget selection: keep the highest-quality docs
    * (rounded score `q`, ties to smallest doc_id) until `budget` tokens
    * fill. Cumulative sum over a unique ordering → frame semantics
    * identical across engines. Input needs (lang_pred, doc_id, q,
    * n_tokens); shared by the q61 contract query and the curate CLI.
    */
  def tokenBudgetFilter(cur: DataFrame, budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang_pred"))
      .orderBy(col("q").desc, col("doc_id").asc)
    cur.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .select(col("lang_pred"), col("doc_id"), col("n_tokens"),
        col("cum_tokens"))
  }

  /** Concat-and-chunk sequence packing — the step that turns curated
    * documents into fixed-length training sequences: per language stream,
    * documents concatenate in doc_id order (one EOS token after each) and
    * the token stream is chunked into `seqLen`-token sequences. Emitted
    * per doc: the sequence its first token lands in, the offset there,
    * and whether it straddles a chunk boundary. Pure integer window
    * arithmetic over a per-partition cumulative sum — packing is
    * inherently sequential, so the parallel unit is the partition key
    * (language here; a 100 TB pipeline packs per shard the same way).
    */
  def packSequences(docTokens: DataFrame, seqLen: Int = 512,
                    partCol: String = "lang_pred"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(partCol)).orderBy(col("doc_id"))
    docTokens
      .withColumn("cum", sum(col("n_tokens") + lit(1L)).over(w))
      .withColumn("seq_start", col("cum") - (col("n_tokens") + lit(1L)))
      .select(col(partCol), col("doc_id"), col("n_tokens"),
        expr(s"seq_start div $seqLen").as("seq_id"),
        expr(s"seq_start % $seqLen").as("seq_offset"),
        (expr(s"(seq_start + n_tokens - 1) div $seqLen") =!=
          expr(s"seq_start div $seqLen")).as("spans_boundary"))
  }

  /** Language ID: explode tokens → broadcast-join lexicon → per-doc hit
    * count per language → argmax (ties: lexicographically smallest lang;
    * no hits: 'und'). One shuffle keyed by doc_id.
    */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lex = broadcast(langLexicon.toDF("lex_lang", "token"))
    val toks = docs.select(col("doc_id"),
      explode(tokens(col(textCol))).as("token"))
    val hits = toks.join(lex, "token")
      .groupBy(col("doc_id"), col("lex_lang"))
      .agg(count(lit(1)).as("hits"))
    val best = hits.groupBy(col("doc_id"))
      .agg(max(col("hits")).as("max_hits"))
    val pred = hits.join(best, "doc_id")
      .filter(col("hits") === col("max_hits"))
      .groupBy(col("doc_id"))
      .agg(min(col("lex_lang")).as("lang_pred"))
    docs.select(col("doc_id"))
      .join(pred, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("lang_pred"), lit("und"))
        .as("lang_pred"))
  }
}
