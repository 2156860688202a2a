package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Bpe, Dedup}

/** Corpus-scale text-dedup run record — the documents-table companion to
  * [[AnnScale]]/[[ArScale]]/[[SmurfScale]] (dev tool, run manually;
  * results recorded in README).
  *
  * The sf0.1 testdata carries 5k documents; this main synthesizes a
  * deterministic corpus 200× that (default 1M docs, 50–200 tokens each
  * from a 50k-word log-uniform ≈ Zipf(1) vocabulary — every token a pure
  * sine-fract hash of (content id, position), so the same id yields the
  * same text anywhere, no RNG state) with PLANTED structure: the last
  * 20k ids re-derive from content ids 0..10k — 10k verbatim copies
  * (exact duplicates) and 10k copies with ~5 % of tokens replaced
  * (near duplicates, shingle-Jaccard ≈ 0.75). Then it times the dedup
  * lifecycle at that scale on the same operators the named queries
  * hash-check, and scores each against the known plant:
  *
  *  - exact dedup (q22's groupBy-digest): must find EXACTLY the 10k
  *    planted copy groups — a correctness assertion at scale, not a
  *    statistic;
  *  - Bloom-screened incremental dedup (q84): history = the first
  *    n−20k docs, batch = the 20k planted; every exact copy must drop
  *    (the filter's one-sided guarantee), near-dups survive up to fpp
  *    false-positive losses;
  *  - MinHash+LSH near-dup pairs (q23): wall time for the full
  *    shingle→signature→band→join→exact-Jaccard pipeline, plus measured
  *    recall of the planted near pairs (theory for k=32, b=8, r=4 at
  *    J≈0.75: 1−(1−J⁴)⁸ ≈ 0.94) and of the planted exact pairs
  *    (J = 1 → must be 1.0);
  *  - BPE tokenizer training (q91's operator) at corpus scale: one
  *    word-frequency pass, 16 merge rounds over the ≈50k-row vocab
  *    table, then the map-only encode (q92's operator) timed as
  *    tokens/sec.
  *
  * Prints one JSON line with all timings, counts, and recalls.
  */
object TextScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val planted = 10000L        // per family (exact, near)
    require(n > 4 * planted, s"n=$n too small for 2×$planted planted docs")
    val vocab = 50000.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // deterministic uniform in [0, 1): the sine-fract hash (AnnScale's
    // idiom) — pure codegen arithmetic, no per-row RNG state
    def u(a: Column, b: Column, c: Double): Column = {
      val s = sin(a * 12.9898 + b * 78.233 + c * 37.719) * 43758.5453
      s - floor(s)
    }
    // log-uniform rank in [1, vocab] → frequencies ∝ 1/rank (Zipf s=1):
    // the head is heavy (shared shingles across docs, like real text),
    // the tail long (most shingles doc-unique)
    def word(cid: Column, p: Column, salt: Double): Column =
      concat(lit("w"), floor(pow(lit(vocab), u(cid, p, salt))).cast("long"))
    def t0() = System.nanoTime()
    def secs(t: Long) = (System.nanoTime() - t) / 1e9

    val exactLo = n - 2 * planted   // ids [exactLo, nearLo): verbatim copies
    val nearLo = n - planted        // ids [nearLo, n): ~5 % tokens replaced
    val tGen = t0()
    val id = col("id")
    val cid = when(id >= nearLo, id - nearLo)
      .when(id >= exactLo, id - exactLo).otherwise(id)
    val isNear = id >= nearLo
    val len = (lit(50) + floor(u(cid, lit(-1.0), 1.0) * 150)).cast("int")
    val docs = spark.range(n).select(id.as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), len - 1), p => {
          val replaced = isNear && (u(cid, p.cast("double"), 3.0) < 0.05)
          when(replaced, word(cid, p.cast("double"), 9.0))
            .otherwise(word(cid, p.cast("double"), 0.0))
        })).as("text"))
      .persist()
    docs.count()
    val genSec = secs(tGen)

    // exact dedup: the 10k planted copy groups, found exactly
    val tExact = t0()
    val dupGroups = Dedup.exact(docs).filter(col("n_dups") > 1).count()
    val exactSec = secs(tExact)

    // Bloom screen: history folds once, the batch screens map-only;
    // every true duplicate must drop (one-sided guarantee)
    val history = docs.filter(col("doc_id") < exactLo)
    val batch = docs.filter(col("doc_id") >= exactLo)
    val tBloom = t0()
    val bloomKept = Dedup.bloomIncrementalDedup(history, batch)
      .select(col("doc_id")).as[Long].collect().toSet
    val bloomSec = secs(tBloom)
    val exactIds = (exactLo until nearLo).toSet
    val keptExact = bloomKept.count(exactIds.contains) // MUST be 0
    val keptNear = bloomKept.size - keptExact          // ≈ planted·(1−fpp)

    // MinHash + LSH over the full corpus
    val tLsh = t0()
    val pairs = Dedup.minhashLshPairs(docs)
      .select(col("doc_a"), col("doc_b")).persist()
    val nPairs = pairs.count()
    val lshSec = secs(tLsh)
    def recallOf(lo: Long): Double = {
      val expect = spark.range(planted)
        .select(col("id").as("doc_a"), (col("id") + lo).as("doc_b"))
      expect.join(pairs, Seq("doc_a", "doc_b"), "left_semi")
        .count().toDouble / planted
    }
    val recallNear = recallOf(nearLo)
    val recallExact = recallOf(exactLo)

    // df-gated exact n-gram Jaccard (q25's operator with maxDf): the
    // UNgated form's inverted-index self-join is Σ df² — boilerplate
    // shingles alone make it infeasible at this scale — while the gate
    // bounds it at Σ min(df, 50)²; planted pairs share mostly
    // family-unique shingles (df ≤ 3), so the gate costs ~no recall
    val tNj = t0()
    val njPairs = Dedup.ngramJaccardPairs(docs, minJaccard = 0.5,
        maxDf = 50)
      .select(col("doc_a"), col("doc_b")).persist()
    val nNjPairs = njPairs.count()
    val njSec = secs(tNj)
    def njRecallOf(lo: Long): Double = {
      val expect = spark.range(planted)
        .select(col("id").as("doc_a"), (col("id") + lo).as("doc_b"))
      expect.join(njPairs, Seq("doc_a", "doc_b"), "left_semi")
        .count().toDouble / planted
    }
    val njRecallNear = njRecallOf(nearLo)
    val njRecallExact = njRecallOf(exactLo)

    // BPE at corpus scale — the vocab-table factoring proven where it
    // matters: training scans the corpus ONCE (word-frequency pass over
    // ~200M tokens), then 16 merge rounds touch only the ≈50k-row vocab
    // table; encoding is a map-only projection timed as corpus
    // tokens/sec. The planted duplicates don't perturb the trainer (they
    // only re-weight already-frequent words).
    // the synthetic vocabulary is "w<rank>" — letters + digits
    val bpePattern = "^[a-z0-9]+$"
    val tBpeTrain = t0()
    val wf = Bpe.wordFrequencies(docs, wordPattern = bpePattern).persist()
    val vocabSize = wf.count()
    val merges = Bpe.learnMerges(wf, numMerges = 16)
    val bpeTrainSec = secs(tBpeTrain)
    wf.unpersist()
    val tBpeEnc = t0()
    val encTotals = Bpe
      .encodeTokenCounts(docs, merges, wordPattern = bpePattern)
      .agg(sum(col("n_words")).as("w"), sum(col("n_bpe_tokens")).as("t"))
      .head()
    val (nWords, nBpeTokens) = (encTotals.getLong(0), encTotals.getLong(1))
    val bpeEncSec = secs(tBpeEnc)
    // a word is ≥1 token and ≤|word| symbols: 16 merges on a Zipf head
    // must all fire and must compress strictly below the raw char count
    val wordsArr = filter(split(col("text"), "\\s+"),
      w => w.rlike(bpePattern))
    val nWordChars = docs.select(aggregate(wordsArr, lit(0L),
        (a, x) => a + length(x).cast("long")).as("c"))
      .agg(sum(col("c"))).head().getLong(0)
    assert(merges.size == 16, s"expected 16 merges, got ${merges.size}")
    assert(nBpeTokens >= nWords && nBpeTokens < nWordChars,
      s"BPE token count $nBpeTokens outside ($nWords, $nWordChars)")

    assert(dupGroups == planted,
      s"exact dedup found $dupGroups dup groups, expected $planted")
    assert(keptExact == 0,
      s"Bloom kept $keptExact true duplicates — one-sided guarantee broken")
    assert(recallExact == 1.0,
      s"LSH missed exact-duplicate pairs (recall $recallExact)")

    println(s"""{"n":$n,"planted_per_family":$planted,""" +
      s""""gen_sec":$genSec,"exact_sec":$exactSec,""" +
      s""""dup_groups":$dupGroups,"bloom_sec":$bloomSec,""" +
      s""""bloom_kept_exact":$keptExact,"bloom_kept_near":$keptNear,""" +
      s""""lsh_sec":$lshSec,"lsh_pairs":$nPairs,""" +
      s""""recall_near":$recallNear,"recall_exact":$recallExact,""" +
      s""""ngram_gated_sec":$njSec,"ngram_gated_pairs":$nNjPairs,""" +
      s""""ngram_recall_near":$njRecallNear,""" +
      s""""ngram_recall_exact":$njRecallExact,""" +
      s""""bpe_vocab":$vocabSize,"bpe_train_sec":$bpeTrainSec,""" +
      s""""bpe_encode_sec":$bpeEncSec,"bpe_words":$nWords,""" +
      s""""bpe_tokens":$nBpeTokens,""" +
      s""""bpe_tokens_per_sec":${(nBpeTokens / bpeEncSec).toLong}}""")
    spark.stop()
  }
}
